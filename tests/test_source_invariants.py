"""Source lints pinning hard-won execution-model invariants (NEXT.md).

Three rules the repo's scale posture depends on, enforced mechanically so a
future edit can't silently regress them:

1. **Row-at-a-time Python UDFs are the slow path** — exactly ONE site is
   allowed, the §2 B35 contract exhibit in ``operators/udfs.py`` (pinned to
   a 5-row frame as the deliberate anti-pattern demonstration; VERDICT r12
   re-confirmed production paths use pandas UDFs / built-ins).
2. **repartitionByRange is banned where file layout feeds an oracle or
   stability check** (per-run sampled boundaries — the round-7 zone-map
   nondeterminism): exactly ONE site is allowed, the content-checked
   range-sorted writer in ``sources/writers.py`` whose docstring states why
   the ban does not apply (its oracle checks content, not layout).
3. **DataFrame, not RDD** — no ``.rdd`` escape hatch, no ``mapPartitions``:
   the imperative tail is Arrow-batched ``mapInPandas``/``applyInPandas``
   everywhere.  ``sparkContext`` uses are fine (addPyFile / parallelism /
   broadcast handles), so only the RDD data-path spellings are asserted
   absent.

Tokenize-based like test_driver_boundedness: docstring/comment mentions of
these names are STRING/COMMENT tokens and don't count; only real attribute
references do.  If a new legitimate site ever appears, extend the allowed
map here WITH its justification — don't weaken the rule.
"""

from __future__ import annotations

import io
import os
import tokenize
from collections import Counter

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "spark_multiboost_spark")


def _attr_sites(names):
    """Map name -> Counter{relpath: count} of `.name` attribute references
    in package source (docstrings/comments excluded by tokenization)."""
    out = {n: Counter() for n in names}
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, PKG)
            with open(path, encoding="utf-8") as fh:
                src = fh.read()
            prev = None
            for tok in tokenize.generate_tokens(io.StringIO(src).readline):
                if tok.type == tokenize.COMMENT:
                    continue
                if tok.type == tokenize.NAME and prev == "." and tok.string in out:
                    out[tok.string][rel] += 1
                if tok.type in (tokenize.NAME, tokenize.OP, tokenize.NUMBER,
                                tokenize.STRING):
                    prev = tok.string
    return out


def test_single_row_udf_exhibit():
    sites = _attr_sites(["udf"])["udf"]
    assert dict(sites) == {os.path.join("operators", "udfs.py"): 1}, (
        "row-at-a-time F.udf outside the pinned B35 exhibit — use a pandas "
        f"UDF or built-ins on any real path: {dict(sites)}"
    )


def test_repartition_by_range_confined_to_content_checked_writer():
    sites = _attr_sites(["repartitionByRange"])["repartitionByRange"]
    assert dict(sites) == {os.path.join("sources", "writers.py"): 1}, (
        "repartitionByRange outside the content-checked range-sorted writer "
        "— its per-run sampled boundaries break any layout-fed oracle or "
        f"stability check (NEXT.md invariant): {dict(sites)}"
    )


def test_no_rdd_data_path():
    found = _attr_sites(["rdd", "mapPartitions", "parallelize"])
    hits = {n: dict(c) for n, c in found.items() if c}
    assert not hits, f"RDD data-path spelling in package source: {hits}"


def test_pandas_round_confined_to_rows_only_stub():
    """pandas .round is half-EVEN vs SQL ROUND's half-up — it flipped real
    rows at sf0.1 once (verify-skill history) and is banned on any
    oracle-compared output; floor(x*1e6+0.5)/1e6 is the sanctioned form.
    The single allowed site is the stubbed multimodal decoder, whose
    queries are rows-only checked (no oracle to diverge from).  F.round
    (Spark SQL half-up, matched by the oracles' ROUND) is excluded by
    checking the receiver."""
    sites = Counter()
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, PKG)
            with open(path, encoding="utf-8") as fh:
                src = fh.read()
            toks = [t for t in tokenize.generate_tokens(io.StringIO(src).readline)
                    if t.type in (tokenize.NAME, tokenize.OP, tokenize.NUMBER,
                                  tokenize.STRING)]
            for i, tok in enumerate(toks):
                if (tok.type == tokenize.NAME and tok.string == "round"
                        and i >= 2 and toks[i - 1].string == "."
                        and toks[i - 2].string != "F"):
                    sites[rel] += 1
    assert dict(sites) == {os.path.join("functions", "multimodal.py"): 1}, (
        f"pandas-style .round outside the rows-only decode stub: {dict(sites)}"
    )
