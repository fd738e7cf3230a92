#!/usr/bin/env python
"""Capture .explain("formatted") for headline queries into
plans/r14/<name>_<tag>.txt (tag = before/after). Explain-only: plans are
built but not executed, so this is cheap and does not disturb timings.

Usage: python plans/r14/capture_plans.py <tag> [name ...]
       (no names = every bench HEADLINE query)
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from gpssbzd_spark import corpus, get_session

    import bench

    spark = get_session(app_name="gpssbzd_capture_plans")
    qs = corpus.queries()
    if not names:
        names = list(bench.HEADLINE)

    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    failed: list[str] = []
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            print(f"captured {name}")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"FAILED {name}: {type(e).__name__}: {e}", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()
    if failed:
        print(f"failed: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
