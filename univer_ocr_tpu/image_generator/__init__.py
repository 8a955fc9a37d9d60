from .convert import to_bytesio
from .generate import LayeredImage, generate_demo, random_font, random_text
