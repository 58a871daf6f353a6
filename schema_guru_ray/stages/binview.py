"""Zero-copy access to Arrow binary columns.

``column.to_pylist()`` materializes every payload as a fresh Python
``bytes`` object — a full copy of the column's value buffer. For the
clips table that is the entire audio corpus copied once per pass, pure
memory-bus cost on the exact stages (decode/validate) that are
bandwidth-bound at high parallelism (BASELINE.md scaling ladder).

:func:`binary_views` instead returns ``memoryview`` slices of the Arrow
value buffer itself. The WAV/G.711 parsers consume them unchanged
(slicing, ``struct.unpack_from`` and ``np.frombuffer`` all take any
buffer-protocol object, zero-copy). The views borrow the Arrow buffer:
they are valid while the batch (or the views list) is referenced, which
holds for map_batches kernels that consume them within the call.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa


def binary_views(col) -> List[Optional[memoryview]]:
    """Arrow (large_)binary array/chunked-array → list of memoryviews
    (None for null entries), zero-copy."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out: List[Optional[memoryview]] = []
    for ch in chunks:
        n = len(ch)
        if n == 0:
            continue
        if pa.types.is_large_binary(ch.type) or pa.types.is_large_string(ch.type):
            odtype, owidth = np.int64, 8
        elif pa.types.is_binary(ch.type) or pa.types.is_string(ch.type):
            odtype, owidth = np.int32, 4
        else:  # pragma: no cover - misuse guard
            raise TypeError(f"binary_views: unsupported Arrow type {ch.type}")
        bufs = ch.buffers()
        vbuf = bufs[2]
        if vbuf is None:  # all-null chunk
            out.extend([None] * n)
            continue
        offs = np.frombuffer(
            bufs[1], dtype=odtype, count=n + 1, offset=ch.offset * owidth
        )
        mv = memoryview(vbuf)
        if ch.null_count:
            valid = ch.is_valid().to_numpy(zero_copy_only=False)
            out.extend(
                mv[offs[i] : offs[i + 1]] if valid[i] else None for i in range(n)
            )
        else:
            out.extend(mv[offs[i] : offs[i + 1]] for i in range(n))
    return out
