"""Model-based CRUD property test: random insert/update/delete sequences on
``VectorDB`` must leave exactly the rows a 30-line pure-Python model of a
content-addressed store predicts.

The model is the semantic contract in miniature: a dict keyed by canonical
metadata JSON — insert adds missing content; update patches matched rows and
re-keys them, colliding content collapsing to one row; delete removes
positively-matched rows only.  Each Hypothesis example replays the same
operation sequence against both and diffs the full final state (metadata
dicts, not just counts)."""

from __future__ import annotations

import json
import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from modal_vector_db_spark.engine import VectorDB

_LANGS = ["en", "de", "fr"]
_META = st.fixed_dictionaries(
    {
        "lang": st.sampled_from(_LANGS),
        "n": st.integers(min_value=0, max_value=3),
    }
)

_OP = st.one_of(
    st.tuples(st.just("insert"), st.lists(_META, min_size=1, max_size=4)),
    st.tuples(
        st.just("update"),
        st.sampled_from(_LANGS),  # filter: lang == value
        st.sampled_from([{"tag": "hot"}, {"n": 9}, {"lang": "zz"}, {"tag": None}]),
    ),
    st.tuples(st.just("delete"), st.sampled_from(_LANGS + ["zz"])),
)


def _model_apply(model: dict, op) -> None:
    """model: canonical-json -> metadata dict."""
    kind = op[0]
    if kind == "insert":
        for m in op[1]:
            model.setdefault(json.dumps(m, sort_keys=True), dict(m))
    elif kind == "update":
        _, lang, patch = op
        matched = [k for k, m in model.items() if m.get("lang") == lang]
        for k in matched:
            m = model.pop(k)
            for pk, pv in patch.items():
                if pv is None:
                    m.pop(pk, None)
                else:
                    m[pk] = pv
            # collision: existing content wins (ON CONFLICT DO NOTHING)
            model.setdefault(json.dumps(m, sort_keys=True), m)
    else:
        _, lang = op
        for k in [k for k, m in model.items() if m.get("lang") == lang]:
            del model[k]


import pytest


@pytest.mark.parametrize("versioned", [False, True], ids=["plain", "versioned"])
@pytest.mark.slow
def test_crud_sequences_match_model(spark, tmp_path, versioned):
    """Both backends: the plain catalog's hardlink-carrying file-pruned
    rewrites and the versioned manifest log's CAS insert + reference-
    carrying commits must both realize the same content-addressed
    semantics under random operation sequences."""

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ops=st.lists(_OP, min_size=1, max_size=5))
    def run(ops):
        wh = str(tmp_path / f"wh_{uuid.uuid4().hex[:8]}")
        db = VectorDB(
            spark, "crudprop", embedding_dim=8, warehouse=wh,
            create_new_table=True, versioned=versioned,
        )
        model: dict = {}
        for op in ops:
            if op[0] == "insert":
                db.insert(op[1], embed_field="lang")
            elif op[0] == "update":
                try:
                    db.update({"lang": op[1]}, op[2])
                except ValueError:
                    # empty patch can't occur by construction; re-raise
                    raise
            else:
                db.delete({"lang": op[1]})
            _model_apply(model, op)
        got = {
            json.dumps(json.loads(r["metadata"]), sort_keys=True)
            for r in db.items().collect()
        }
        assert got == set(model.keys())
        assert db.num_rows() == len(model)
        if versioned and model:
            from modal_vector_db_spark.sources import versioned as vcat

            # the O(manifest) count stayed in lockstep through every commit
            assert vcat.manifest_row_count(db.name, wh) == len(model)

    run()
