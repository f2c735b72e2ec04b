"""Two-SF-in-one-session pin for sf-keyed scratch state (the r12 lesson).

Lazily-read scratch parquet/files must be keyed by sf_dir: a fixed path +
mode=overwrite is wrong the moment one process runs two SFs — the earlier
result DataFrame re-reads the clobbered files.  The verify pattern is
A-B-A: run at sfA, run at sfB, re-run at sfA — the two sfA results must be
value-identical.

Three queries cover the three distinct scratch mechanisms:
- ``q_a13_model_roundtrip`` — sf_scratch("model") parquet written once and
  lazily re-read by the returned DataFrame;
- ``q_a1_text_parser`` — sf_scratch text-file fixture behind the
  _COMPLETE-sentinel reuse guard;
- ``q_d3_graph_index_persist`` — sf_scratch("gidx") edge parquet PLUS the
  session-scoped ``_nnd_graph`` cache, whose explicit member-set tag must
  keep the sf0.001 corpus from aliasing the sf0.01 index (NEXT.md
  invariant).

A full 8-query A-B-A run over every sf_scratch consumer (incl. both D7
estimators and the two streaming replays) passed in round 17; this slim
version keeps the invariant pinned at suite cost the suite can afford.
"""

from __future__ import annotations

import hashlib

import pytest

from spark_multiboost_spark.registry import all_queries

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"

NAMES = ["q_a13_model_roundtrip", "q_a1_text_parser", "q_d3_graph_index_persist"]


def _value_hash(df) -> tuple[str, int]:
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        pdf[c] = (
            pdf[c].map(lambda x: f"{x:.6f}")
            if pdf[c].dtype.kind == "f"
            else pdf[c].astype(str)
        )
    digest = hashlib.md5(
        "\n".join(sorted(map("|".join, pdf.itertuples(index=False, name=None)))).encode()
    ).hexdigest()
    return digest, len(pdf)


@pytest.mark.parametrize("name", NAMES)
def test_aba_two_sf_scratch_stability(spark, name):
    qs = all_queries()
    first = _value_hash(qs[name].fn(spark, SF_A))
    other = _value_hash(qs[name].fn(spark, SF_B))
    again = _value_hash(qs[name].fn(spark, SF_A))
    assert first[1] > 0, f"{name}: vacuous A run (0 rows proves nothing)"
    assert first == again, (
        f"{name}: sfA result changed after an sfB run in the same session — "
        f"scratch state is not sf-keyed ({first} != {again}; sfB={other})"
    )
