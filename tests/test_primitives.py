"""Alphabet/encoding parity with the reference (primitives/__init__.py)."""

import numpy as np
import pytest

from univer_ocr_tpu import primitives as P


def test_alphabet_size_and_order():
    assert len(P.CHARS) == 162
    assert P.CHARS[0] == '\t'
    assert P.CHARS[1] == ' '
    assert P.CHARS[2] == 'а'          # Russian lowercase starts at 2
    assert P.CHARS[68] == '0'         # digits after 66 Russian letters
    assert P.CHARS[78] == 'a'         # English lowercase after digits
    assert P.CHARS_IDS['a'] == 78
    assert len(set(P.CHARS)) == 162   # no duplicates


def test_bits_count():
    assert P.BITS_COUNT == 8


def test_encoding_roundtrip():
    for char in P.CHARS:
        enc = P.encode_char(char)
        assert len(enc) == P.BITS_COUNT
        assert P.decode_char(enc) == char


def test_encoding_lsb_first():
    # char id 1 (' ') -> '10000000', id 2 -> '01000000', id 3 -> '11000000'
    assert P.encode_char(P.CHARS[1]) == '10000000'
    assert P.encode_char(P.CHARS[2]) == '01000000'
    assert P.encode_char(P.CHARS[3]) == '11000000'


def test_unknown_char_encodes_all_ones():
    assert P.encode_char('€') == '1' * P.BITS_COUNT
    # all-ones decodes to 'unknown' unless id 255 < 162 — it is 255, so unknown
    assert P.decode_char('1' * P.BITS_COUNT) == 'unknown'


def test_similar_chars():
    assert P.are_similar('а', 'a')  # Cyrillic а / Latin a
    assert P.are_similar('a', 'а')
    assert P.are_similar('С', 'C')
    assert not P.are_similar('б', 'b')
    # Reference quirk: a char belonging to a pair is "similar" to itself
    # (its pair tuple contains it), while unpaired chars are not.
    assert P.are_similar('a', 'a')
    assert not P.are_similar('b', 'b')


def test_fonts_available():
    assert len(P.FONTS_LIST) >= 1
    font = P.FONTS_LIST[0].normal(size=20)
    assert font is not None
    # must cover Cyrillic
    assert font.getbbox('Привет')[2] > 0
