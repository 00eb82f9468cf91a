from .png import decode_png, encode_png  # noqa: F401
