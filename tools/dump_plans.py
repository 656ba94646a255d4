"""Dump `.explain("formatted")` for named registry queries to files —
the judge-facing plan evidence under plans/r<round>/.

Run: python tools/dump_plans.py <outdir> <suffix> <query> [<query>...]
e.g. python tools/dump_plans.py plans/r11 after q_events_rfm
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

from streamclient_spark.plans.registry import REGISTRY, load_all
from streamclient_spark.session import get_spark


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    load_all()
    spark = get_spark("dump-plans")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(path, len(buf.getvalue().splitlines()), "lines", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
