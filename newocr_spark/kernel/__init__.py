from .grid import binarize, remove_leading_spaces  # noqa: F401
from .ccl import connected_components  # noqa: F401
from .features import featurize, featurize_many  # noqa: F401
from .lines import line_bounds  # noqa: F401
from .scan import scan_grid, scan_image_bytes  # noqa: F401
