"""Capture .explain('formatted') for named declared queries into
plans/r13/<query>_<suffix>.txt. Usage:
    python plans/r13/capture.py after bm25_search,tfidf_top_terms
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as m  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = SparkSession.builder.master("local[4]").getOrCreate()
    qs = m.queries()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
