from .glyphs import GLYPHS, SPACE_WIDTH, TRACKING, CELL_HEIGHT, LINE_GAP  # noqa: F401
from .render import render_line, render_text_image, render_train_image  # noqa: F401
from .train import train_font  # noqa: F401
