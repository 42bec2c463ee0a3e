"""CI guard (SURVEY.md §7.3-4): the input_hint mandates vectorized
pandas/Arrow UDFs only — no per-row Python `udf()` anywhere in the package."""

import os
import re

PKG = os.path.join(os.path.dirname(__file__), "..", "imc")


def test_no_row_udf_in_package():
    bad = []
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path) as f:
                src = f.read()
            # forbid pyspark.sql.functions.udf( / F.udf( — pandas_udf is
            # fine — and any DataFrame.rdd access: .rdd forces eager
            # physical planning + an RDD conversion inside otherwise-lazy
            # operator constructors (VERDICT r03 #5)
            pat = (r"\bF\.udf\s*\(|\bfunctions\.udf\s*\(|\.rdd\b|"
                   r"from\s+pyspark\.sql\.functions\s+import\s+(?:[\w,\s]*\b)udf\b")
            for m in re.finditer(pat, src):
                start = src.rfind("\n", 0, m.start()) + 1
                line = src[start:src.find("\n", m.start())]
                bad.append((path, line.strip()))
    assert not bad, bad
