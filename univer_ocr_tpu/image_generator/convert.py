"""PIL image -> PNG byte stream (reference image_generator/convert.py:4-8)."""

from io import BytesIO


def to_bytesio(image):
    img_io = BytesIO()
    image.save(img_io, 'PNG')
    img_io.seek(0)
    return img_io
