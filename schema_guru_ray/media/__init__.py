"""Pure-stdlib media codecs (no PIL/libjpeg/ffmpeg in this container)."""

from schema_guru_ray.media.png import PngDecodeError, decode_png, encode_png  # noqa: F401
from schema_guru_ray.media.y4m import (  # noqa: F401
    Y4mDecodeError,
    decode_y4m,
    encode_y4m,
    iter_y4m_frames,
)
