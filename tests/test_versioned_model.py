"""Model-based check of the manifest-log layer alone (no Spark): random
append/replace/rollback/vacuum sequences against an in-memory model of the
log.  Data files are stand-in empty ``.parquet`` files — the layer under
test is commit bookkeeping: head resolution, history, retention, and
which physical files survive vacuum."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from modal_vector_db_spark.sources import versioned as vcat


def _mkfiles(base: str, version_hint: int, k: int) -> list[str]:
    rels = []
    os.makedirs(os.path.join(base, "data"), exist_ok=True)
    for i in range(k):
        rel = os.path.join("data", f"v{version_hint}_{i}.parquet")
        open(os.path.join(base, rel), "w").close()
        rels.append(rel)
    return rels


_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.integers(min_value=1, max_value=3)),
        st.tuples(st.just("replace"), st.integers(min_value=0, max_value=2)),
        st.tuples(st.just("rollback"), st.integers(min_value=1, max_value=5)),
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=40, deadline=None)
@given(ops=_OPS, keep=st.integers(min_value=1, max_value=4))
def test_manifest_log_matches_model(tmp_path_factory, ops, keep):
    wh = str(tmp_path_factory.mktemp("vmodel"))
    name = "m"
    base = os.path.join(wh, name)
    os.makedirs(base, exist_ok=True)

    model: list[list[str]] = []  # model[v-1] = file list of version v
    for step, (op, arg) in enumerate(ops, start=1):
        if op == "append":
            new = _mkfiles(base, step, arg)
            parent = model[-1] if model else []
            model.append(parent + new)
            vcat._try_commit(name, wh, len(model), model[-1], "append")
        elif op == "replace":
            new = _mkfiles(base, step, arg)
            model.append(new)
            vcat._try_commit(name, wh, len(model), new, "replace")
        else:  # rollback to version arg if it exists, else skip
            if arg <= len(model):
                model.append(list(model[arg - 1]))
                vcat._try_commit(name, wh, len(model), model[-1], f"rollback(v{arg})")

    if not model:
        return
    head = vcat.current_version(name, wh)
    assert head == len(model)
    m = vcat._read_manifest(name, wh, head)
    assert m["files"] == model[-1]
    assert [h["version"] for h in vcat.history(name, wh)] == list(range(1, head + 1))

    vcat.vacuum(name, wh, keep_versions=keep)
    kept_versions = list(range(max(1, head - keep + 1), head + 1))
    live = {f for v in kept_versions for f in model[v - 1]}
    # retained versions still resolve to their exact file lists
    for v in kept_versions:
        assert vcat._read_manifest(name, wh, v)["files"] == model[v - 1]
    assert [h["version"] for h in vcat.history(name, wh)] == kept_versions
    # physical files: exactly the live set survives
    on_disk = {
        os.path.join("data", f)
        for f in os.listdir(os.path.join(base, "data"))
        if f.endswith(".parquet")
    }
    assert on_disk == live
