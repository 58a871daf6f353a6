"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in the library) initializes or shuts down Ray.

* ``entry()`` — flagship pipeline on /root/testdata/sf0.001: validate the
  deterministic synthetic clips corpus (BASELINE.json input_hint shape) and
  return the per-codec pass/fail verdict table.
* ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 + the training-data operator suite); each takes ``sf_dir``.
* ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query
  (same column names/aliases as the Ray results). Non-SQL ops (LSH dedup,
  IVF search, schema JSON, clips validation on engine-generated input) are
  intentionally absent → the driver records rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from schema_guru_ray.pipelines.queries import ORACLES, QUERIES


def entry() -> Any:
    """Flagship: clips validation at sf0.001 → per-codec verdict table."""
    from schema_guru_ray.pipelines.queries import clips_codec_verdicts

    return clips_codec_verdicts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
