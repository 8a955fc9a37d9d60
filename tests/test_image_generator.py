"""Page generator <-> ground-truth decoder round trip.

The strongest contract test in the reference's suite family: a generated
page's mask layers must decode back to the exact input text via the pure
`interpret()` decoder (reference wires this via the /interpret_data web
route; here it is an automated test)."""

import random

import numpy as np
import pytest

from univer_ocr_tpu.image_generator import LayeredImage, random_font, random_text
from univer_ocr_tpu.interpreter import interpret
from univer_ocr_tpu.primitives import FONTS_LIST


def make_page(texts, width=900, height=600, font_size=24, seed=0):
    random.seed(seed)
    page = LayeredImage(width, height, (255, 255, 255, 255))
    font = FONTS_LIST[0].normal(size=font_size)
    for text in texts:
        page.add_paragraph(text, font)
    return page


def test_layer_names_parity():
    assert LayeredImage.layer_names == [
        'image', 'image_monochrome', 'paragraph', 'line_top', 'line_center',
        'line_bottom', 'letter_spacing', 'char_mask_box', 'char_full_box',
        'bit_0', 'bit_1', 'bit_2', 'bit_3', 'bit_4', 'bit_5', 'bit_6', 'bit_7']


def test_paragraph_is_drawn():
    page = make_page([['Hello world', 'second line']])
    assert page.paragraphs_added == 1
    assert np.asarray(page.layers['image_monochrome']).sum() > 0
    assert np.asarray(page.layers['paragraph']).sum() > 0
    for i in range(8):
        pass  # bit layers checked through interpret() below


def test_interpret_round_trip_single_paragraph():
    lines = ['Hello world', 'Привет мир', 'mixed 123 !?']
    page = make_page([lines])
    decoded = interpret(page.get_raw())
    got = [decoded[(0, i)] for i in range(len(lines))]
    assert got == lines


def test_interpret_round_trip_multi_paragraph():
    paras = [['alpha beta'], ['Gamma delta', 'epsilon']]
    page = make_page(paras, seed=3)
    decoded = interpret(page.get_raw())
    texts = set(decoded.values())
    for para in paras:
        for line in para:
            assert line in texts


def test_interpret_round_trip_random_text():
    random.seed(7)
    text = random_text(20, 40)
    page = make_page([text], width=1400, height=900, font_size=18, seed=7)
    assert page.paragraphs_added == 1
    decoded = interpret(page.get_raw())
    got = [decoded[(0, i)] for i in range(len(text))]
    assert got == text


def test_make_divisible_by():
    page = make_page([['abc']], width=720, height=480)
    page.make_divisible_by(16, 16)
    for img in page.get_raw().values():
        assert img.size[0] % 16 == 0 and img.size[1] % 16 == 0
    # reference always adds at least one unit (generate.py:90-101)
    assert page.get_raw()['image'].size == (736, 496)


def test_rotate_keeps_layers_aligned():
    page = make_page([['rotate me please']], seed=5)
    page.rotate(15)
    mono = np.asarray(page.layers['image_monochrome']) > 0
    para = np.asarray(page.layers['paragraph']) > 0
    assert mono.sum() > 0
    # all ink stays inside the rotated paragraph box
    assert (mono & ~para).sum() <= 0.02 * mono.sum()


def test_random_font_and_text():
    random.seed(1)
    font = random_font(12, 36)
    assert font is not None
    text = random_text()
    assert isinstance(text, list) and len(text) >= 1
