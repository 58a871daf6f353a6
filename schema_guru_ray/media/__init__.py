"""Pure-stdlib media codecs (no PIL/libjpeg/ffmpeg in this container)."""

from schema_guru_ray.media.png import PngDecodeError, decode_png, encode_png  # noqa: F401
