"""Minimal JSONPath evaluator + segmentation-key normalizer (the
reference's ``--schema-by`` key extraction, JsonPathExtractor.scala:39-78 /
JsonPathExtractorRDD.scala:53-88).

Supported path subset (covers the reference's documented usage `$.event`):
``$``, dot fields (``$.a.b``), bracket fields (``$['a']``), numeric array
indices (``$.a[0]``). Lookup failures and non-scalar/empty results map to
the ``"unmatched"`` bucket, matching the Spark variant's behavior.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional

UNMATCHED = "unmatched"

_TOKEN_RE = re.compile(
    r"""\.(?P<field>[A-Za-z_][\w\-]*)|\[\s*'(?P<qfield>[^']*)'\s*\]|\[\s*"(?P<dqfield>[^"]*)"\s*\]|\[\s*(?P<index>\d+)\s*\]"""
)


def parse_path(path: str) -> List[Any]:
    if not path.startswith("$"):
        raise ValueError(f"JSONPath must start with $: {path!r}")
    tokens: List[Any] = []
    pos = 1
    while pos < len(path):
        m = _TOKEN_RE.match(path, pos)
        if not m:
            raise ValueError(f"unsupported JSONPath syntax at {path[pos:]!r}")
        if m.group("field") is not None:
            tokens.append(m.group("field"))
        elif m.group("qfield") is not None:
            tokens.append(m.group("qfield"))
        elif m.group("dqfield") is not None:
            tokens.append(m.group("dqfield"))
        else:
            tokens.append(int(m.group("index")))
        pos = m.end()
    return tokens


def query(path: str, doc: Any) -> Optional[Any]:
    cur = doc
    for tok in parse_path(path):
        if isinstance(tok, int):
            if isinstance(cur, list) and 0 <= tok < len(cur):
                cur = cur[tok]
            else:
                return None
        else:
            if isinstance(cur, dict) and tok in cur:
                cur = cur[tok]
            else:
                return None
    return cur


def normalize_key(value: Any) -> str:
    """Lookup result → segment key: stringify, 30-char slice,
    non-[a-zA-Z0-9.-] → '_' (JsonPathExtractor.scala:39-45); null/empty/
    missing → "unmatched" (JsonPathExtractorRDD.scala:53-63)."""
    if value is None or isinstance(value, (dict, list)):
        return UNMATCHED
    s = str(value)
    if isinstance(value, bool):
        s = s.lower()  # JSON booleans stringify lowercase
    if not s.strip():
        return UNMATCHED
    return re.sub(r"[^a-zA-Z0-9.-]", "_", s[:30])


def segment_key(path: str, doc: Any) -> str:
    return normalize_key(query(path, doc))
