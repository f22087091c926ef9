"""Property-based tests (hypothesis): the merge operators against a
pure-Python reference model over random CDC histories.

The model: a dict keyed by id; ``unconditional`` applies batches in
commit order with within-batch latest-ts-wins; ``latest_wins`` keeps
the globally newest ts (commit order breaks ts ties in batch order).
"""

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from s3_sqs_data_ingestion_demo_spark.operators.merge import dedup_latest, merge_upsert

pytestmark = pytest.mark.slow  # multi-minute law: smoke tier skips (pytest.ini)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # key
        st.integers(min_value=0, max_value=20),   # ts
        st.integers(min_value=0, max_value=999),  # payload
    ),
    min_size=0,
    max_size=12,
)


def _spark_df(spark, rows):
    return spark.createDataFrame(
        [(k, t, v) for k, t, v in rows], "id int, ts int, val int"
    )


def _model_dedup(rows):
    """Latest ts per key; ties broken toward the later list position
    (matching the window's arbitrary-but-stable pick is NOT required —
    we only compare on histories without intra-batch ts ties)."""
    out = {}
    for k, t, v in rows:
        if k not in out or t >= out[k][0]:
            out[k] = (t, v)
    return {k: tv for k, tv in out.items()}


def _no_intra_ties(rows):
    seen = set()
    for k, t, _ in rows:
        if (k, t) in seen:
            return False
        seen.add((k, t))
    return True


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(batch=ROWS.filter(_no_intra_ties))
def test_dedup_latest_matches_model(spark, batch):
    got = {
        r.id: (r.ts, r.val)
        for r in dedup_latest(_spark_df(spark, batch), ["id"], "ts").collect()
    }
    assert got == _model_dedup(batch)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(b1=ROWS.filter(_no_intra_ties), b2=ROWS.filter(_no_intra_ties))
def test_unconditional_merge_matches_model(spark, b1, b2):
    target = _spark_df(spark, [(k, t, v) for k, (t, v) in _model_dedup(b1).items()])
    source = _spark_df(spark, b2)
    got = {
        r.id: (r.ts, r.val)
        for r in merge_upsert(target, source, ["id"], "ts", "unconditional").collect()
    }
    model = dict(_model_dedup(b1))
    model.update(_model_dedup(b2))  # source wins unconditionally
    assert got == model


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(b1=ROWS.filter(_no_intra_ties), b2=ROWS.filter(_no_intra_ties))
def test_latest_wins_merge_matches_model(spark, b1, b2):
    d1, d2 = _model_dedup(b1), _model_dedup(b2)
    # avoid cross-batch ts ties (either side may win; engine pick is
    # stable but the model doesn't define it)
    if any(k in d1 and d1[k][0] == tv[0] for k, tv in d2.items()):
        return
    target = _spark_df(spark, [(k, t, v) for k, (t, v) in d1.items()])
    got = {
        r.id: (r.ts, r.val)
        for r in merge_upsert(
            target, _spark_df(spark, b2), ["id"], "ts", "latest_wins"
        ).collect()
    }
    model = dict(d1)
    for k, (t, v) in d2.items():
        if k not in model or t > model[k][0]:
            model[k] = (t, v)
    assert got == model
