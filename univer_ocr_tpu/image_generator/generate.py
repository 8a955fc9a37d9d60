"""Synthetic page renderer: text + 17 aligned ground-truth mask layers.

Behavioral port of the reference LayeredImage (image_generator/generate.py:
12-286): random paragraphs of multi-font RU/EN text drawn onto a page
together with per-pixel supervision layers — paragraph boxes, three line
bands (top/center/bottom), per-char mask/full boxes, letter-spacing
markers, and the 8 bit-plane layers encoding each character's class id.

Layout math is rebuilt on modern Pillow APIs (getbbox/getlength/getmetrics/
getmask) because the reference's font.getsize/getoffset/font.font.getsize
calls were removed in Pillow 10+.  Per-char x positions come from
cumulative advances (`font.getlength(line[:i])`, kerning included), and the
whole line is drawn in one `draw.text` call — per-char geometry and drawn
glyphs therefore agree exactly.  The geometric *contract* the interpreter
relies on is preserved:

  * char_full_box minus letter_spacing leaves one connected component per
    character (bit planes share the same rects);
  * the full-box center lies inside the line_center band;
  * line bands: top = [ascent row, baseline], center = [x-height, baseline],
    bottom = [x-height, descent] (reference generate.py:232-239).

tests/test_image_generator.py round-trips a generated page through the
ground-truth `interpret()` decoder to verify this contract end to end.
"""

import random
from textwrap import wrap

import numpy as np
from PIL import Image, ImageDraw

from ..primitives import BITS_COUNT, CHARS, FONTS_LIST, encode_char


class LayeredImage:
    layer_names = [
        'image',
        'image_monochrome',
        'paragraph',
        'line_top',
        'line_center',
        'line_bottom',
        'letter_spacing',
        'char_mask_box',
        'char_full_box',
        *[f'bit_{i}' for i in range(BITS_COUNT)],
    ]
    colors = {
        'image': (0, 0, 0, 255),
        **{layer: 255 for layer in layer_names[1:]},
    }
    colors_demo = {
        'image': (0, 0, 0, 255),
        'paragraph': (0, 0, 200, 50),
        'line_top': (200, 0, 0, 100),
        'line_center': (0, 0, 200, 150),
        'line_bottom': (0, 200, 0, 100),
        'letter_spacing': (200, 0, 200, 100),
        'char_mask_box': (200, 200, 0, 100),
        'char_full_box': (200, 200, 0, 100),
        **{f'bit_{i}': (200, 200, 0, 100) for i in range(BITS_COUNT)},
    }

    def __init__(self, width, height, bg_color, use_demo=False):
        self.width, self.height = width, height
        self.bg_color = bg_color
        self.use_demo = use_demo
        self.layers = {
            'image': Image.new('RGBA', (self.width, self.height), self.bg_color),
            **{
                name: Image.new('L', (self.width, self.height))
                for name in self.layer_names[1:]
            }
        }
        self.mask = None
        self._update_mask()
        self.draw = {
            name: ImageDraw.ImageDraw(layer)
            for name, layer in self.layers.items()
        }
        self.demo = {
            'image': Image.new('RGBA', (self.width, self.height), self.bg_color),
            'guidelines': Image.new('RGBA', (self.width, self.height)),
            **{
                name: Image.new('RGBA', (self.width, self.height))
                for name in self.layer_names[1:]
            }
        } if self.use_demo else {}
        self.draw_demo = {
            name: ImageDraw.ImageDraw(layer)
            for name, layer in self.demo.items()
        }
        self.paragraphs_added = 0

    def get_raw(self):
        return self.layers

    def get_demo(self):
        return self.demo

    def rotate(self, angle):
        """Rotate every layer in lockstep with expansion (reference :78-88)."""
        for images_set in [self.layers, self.demo]:
            for name, image in images_set.items():
                bg_color = self.bg_color if image.mode == 'RGBA' else 0
                rot = image.convert('RGBA').rotate(
                    angle, resample=Image.BILINEAR, expand=True)
                fff = Image.new('RGBA', rot.size, bg_color)
                res = Image.composite(rot, fff, rot).convert(image.mode)
                images_set[name] = res
        self.width, self.height = self.layers['image'].size
        return self

    def make_divisible_by(self, x, y):
        """Pad every layer so dims are multiples of (x, y) (reference :90-101).

        Like the reference, always adds at least one unit of padding
        (`x - w % x` is x when already divisible), centered.
        """
        to_add_x = x - self.width % x
        to_add_y = y - self.height % y
        new_size = (self.width + to_add_x, self.height + to_add_y)
        pos = (to_add_x // 2, to_add_y // 2)
        for images_set in [self.layers, self.demo]:
            for name, image in images_set.items():
                bg_color = self.bg_color if image.mode == 'RGBA' else 0
                new_image = Image.new(image.mode, new_size, bg_color)
                new_image.paste(image, pos)
                images_set[name] = new_image
        self.width, self.height = self.layers['image'].size
        return self

    def add_paragraph(self, text, font):
        """Lay out and draw one paragraph (list of text lines) with all
        supervision layers (reference :103-189)."""
        spacing = font.size // 2
        ascent, descent = font.getmetrics()
        m_bbox = font.getbbox('M')
        x_bbox = font.getbbox('x')
        M_height = m_bbox[3] - m_bbox[1]
        x_height = x_bbox[3] - x_bbox[1]
        line_advance = ascent + descent + spacing

        # Paragraph bounding box from per-line ink extents.
        t_width, t_height = 0, 0
        for line in text:
            bbox = font.getbbox(line) if line else (0, 0, 0, 0)
            t_width = max(t_width, int(bbox[2]))
            t_height += line_advance

        margin = 3
        margin2 = 2 * margin
        ones = np.ones((t_height + margin2, t_width + margin2), dtype=np.uint8)
        x, y = None, None
        retries = 0
        while True:
            left_margin = 20
            rand_width = self.width - (t_width + margin2) - left_margin
            rand_height = self.height - (t_height + margin2)
            if rand_width < left_margin or rand_height < 0:
                return  # paragraph too big for the image
            x = random.randint(left_margin, rand_width)
            y = random.randint(0, rand_height)
            if np.sum(ones * self.mask[y:y + t_height + margin2,
                                       x:x + t_width + margin2]) == 0:
                break
            if retries > 100:
                return  # number of retries exceeded
            retries += 1
        self.paragraphs_added += 1
        x, y = x + margin, y + margin

        self._paragraph((x, y, x + t_width, y + t_height))
        self._update_mask()

        dy = 0
        for line in text:
            if not line:
                dy += line_advance
                continue

            bbox = font.getbbox(line)
            left = x + bbox[0]
            right = x + bbox[2]

            y_ascent = y + dy
            y_baseline = y_ascent + ascent
            y_M = y_baseline - M_height
            y_x = y_baseline - x_height
            y_descent = y_baseline + descent

            self._line(left, right, y_ascent, y_M, y_x, y_baseline, y_descent)

            # One draw call for the whole line (kerning-exact); per-char
            # geometry from cumulative advances.
            self._text_line(line, (x, y_ascent), font)

            pens = [font.getlength(line[:i]) for i in range(len(line) + 1)]
            for i, char in enumerate(line):
                pen_l = x + pens[i]
                pen_r = x + pens[i + 1]
                cell_w = pen_r - pen_l
                w10 = max(1, cell_w / 10)

                cb = font.getbbox(char)
                # ink box of this glyph at its pen position (skip inkless
                # glyphs like space — their full box still carries the bits)
                if cb[2] > cb[0] and cb[3] > cb[1]:
                    self._mask_box(char, (pen_l + cb[0], y_ascent + cb[1],
                                          pen_l + cb[2], y_ascent + cb[3]))
                if pen_r - w10 > pen_l + w10:
                    self._full_box(char, (pen_l + w10, y_ascent,
                                          pen_r - w10, y_descent))
                else:   # degenerate narrow cell: keep the full cell
                    self._full_box(char, (pen_l, y_ascent, pen_r, y_descent))

                if i == len(line) - 1:
                    continue
                self._letter_spacing((pen_r - w10, y_ascent,
                                      pen_r + w10, y_descent))

            dy += line_advance

    # -- layer draw helpers (reference :191-256) ---------------------------
    def _paragraph(self, coords):
        self.draw['paragraph'].rectangle(coords, fill=self.colors['paragraph'])
        if self.use_demo:
            self.draw_demo['paragraph'].rectangle(
                coords, fill=self.colors_demo['paragraph'])

    def _text_line(self, line, position, font):
        self.draw['image'].text(position, line, fill=self.colors['image'],
                                font=font)
        self.draw['image_monochrome'].text(
            position, line, fill=self.colors['image_monochrome'], font=font)
        if self.use_demo:
            self.draw_demo['image'].text(
                position, line, fill=self.colors_demo['image'], font=font)

    def _mask_box(self, char, coords):
        self.draw['char_mask_box'].rectangle(
            coords, fill=self.colors['char_mask_box'])
        if self.use_demo:
            self.draw_demo['char_mask_box'].rectangle(
                coords, fill=self.colors_demo['char_mask_box'])

    def _full_box(self, char, coords):
        bits = encode_char(char)
        self.draw['char_full_box'].rectangle(
            coords, fill=self.colors['char_full_box'])
        for i, bit in enumerate(bits):
            if bit == '0':
                continue
            self.draw[f'bit_{i}'].rectangle(coords, fill=self.colors[f'bit_{i}'])
        if self.use_demo:
            self.draw_demo['char_full_box'].rectangle(
                coords, fill=self.colors_demo['char_full_box'])
            for i, bit in enumerate(bits):
                if bit == '0':
                    continue
                self.draw_demo[f'bit_{i}'].rectangle(
                    coords, fill=self.colors_demo[f'bit_{i}'])

    def _letter_spacing(self, coords):
        self.draw['letter_spacing'].rectangle(
            coords, fill=self.colors['letter_spacing'])
        if self.use_demo:
            self.draw_demo['letter_spacing'].rectangle(
                coords, fill=self.colors_demo['letter_spacing'])

    def _line(self, left, right, y_ascent, y_M, y_x, y_baseline, y_descent):
        line_top_coords = (left, y_ascent, right, y_baseline)
        line_center_coords = (left, y_x, right, y_baseline)
        line_bottom_coords = (left, y_x, right, y_descent)

        self.draw['line_top'].rectangle(
            line_top_coords, fill=self.colors['line_top'])
        self.draw['line_center'].rectangle(
            line_center_coords, fill=self.colors['line_center'])
        self.draw['line_bottom'].rectangle(
            line_bottom_coords, fill=self.colors['line_bottom'])

        if self.use_demo:
            def hline(yy, color):
                self.draw_demo['guidelines'].line(
                    (left, yy, right, yy), fill=color, width=1)

            hline(y_ascent, (200, 0, 200))
            hline(y_M, (0, 200, 0))
            hline(y_x, (0, 200, 200))
            hline(y_baseline, (200, 0, 0))
            hline(y_descent, (0, 0, 200))

            self.draw_demo['line_top'].rectangle(
                line_top_coords, fill=self.colors_demo['line_top'])
            self.draw_demo['line_center'].rectangle(
                line_center_coords, fill=self.colors_demo['line_center'])
            self.draw_demo['line_bottom'].rectangle(
                line_bottom_coords, fill=self.colors_demo['line_bottom'])

    def _update_mask(self):
        self.mask = np.array(self.layers['paragraph'])


def random_font(min_size=12, max_size=48):
    """Random family/style/size (reference :262-268)."""
    style = random.choice(['normal', 'bold'])
    font = None
    while font is None:
        font = getattr(random.choice(FONTS_LIST), style)
        font = font(size=random.randint(min_size, max_size))
    return font


def random_text(min_wrap=30, max_wrap=100):
    """Random char-soup words wrapped to a random column width
    (reference :271-279; the Faker branch there is dead code)."""
    text = ' '.join(
        ''.join(random.choice(CHARS[1:]) for _ in range(random.randint(1, 10)))
        for _ in range(random.randint(3, 30)))
    return wrap(text, random.randint(min_wrap, max_wrap))


def generate_demo(width, height):
    layers = LayeredImage(width, height, (200, 200, 200, 255), use_demo=True)
    for _ in range(30):
        layers.add_paragraph(random_text(), random_font())
    return layers.get_raw(), layers.get_demo()
