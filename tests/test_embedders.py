"""Executable coverage for the optional-dependency embedders (U3/U4).

The real deps (sentence_transformers / openai) are absent in this
environment, so the reference-parity classes (`embedders.py:77-119`,
mirroring reference ``embedders.py:36-91``) would otherwise never run.
These tests inject minimal fake modules into ``sys.modules`` so the
construction, dimension, embed, and embed_batch paths actually execute;
separate skip-if-missing tests exercise the real libraries when present.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pandas as pd
import pytest

from modal_vector_db_spark.embedders import (
    HashingEmbedder,
    OpenAIEmbedder,
    SentenceTransformersEmbedder,
    get_embedder,
)

HAS_ST = importlib.util.find_spec("sentence_transformers") is not None
HAS_OPENAI = importlib.util.find_spec("openai") is not None


# ---------------------------------------------------------------- fakes


class _FakeSTModel:
    """Shape-compatible stand-in for sentence_transformers.SentenceTransformer."""

    def __init__(self, model_name):
        self.model_name = model_name

    def get_sentence_embedding_dimension(self):
        return 8

    def encode(self, text_or_texts):
        def one(t):
            rng = np.frombuffer(
                abs(hash(t)).to_bytes(8, "big") * 4, dtype=np.uint8
            ).astype(np.float64)
            v = rng[:8] + 1.0
            return (v / np.linalg.norm(v)).astype(np.float32)

        if isinstance(text_or_texts, str):
            return one(text_or_texts)
        return np.stack([one(t) for t in text_or_texts])


class _FakeOpenAIClient:
    def __init__(self, api_key=None):
        self.api_key = api_key
        self.embeddings = self
        self.calls = []  # one entry per API request: (input, extra kwargs)

    def create(self, model, input, **kw):  # noqa: A002 - mirrors the real signature
        self.calls.append((input, kw))
        dim = kw.get("dimensions") or (1536 if "small" in model else 3072)
        items = [input] if isinstance(input, str) else input
        data = [
            types.SimpleNamespace(embedding=[0.25 + 0.001 * i] * dim)
            for i in range(len(items))
        ]
        return types.SimpleNamespace(data=data)


@pytest.fixture()
def fake_st(monkeypatch):
    mod = types.ModuleType("sentence_transformers")
    mod.SentenceTransformer = _FakeSTModel
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)


@pytest.fixture()
def fake_openai(monkeypatch):
    mod = types.ModuleType("openai")
    mod.OpenAI = _FakeOpenAIClient
    monkeypatch.setitem(sys.modules, "openai", mod)


# ------------------------------------------------- mocked-dep smoke tests


def test_sentence_transformers_contract(fake_st):
    e = SentenceTransformersEmbedder("all-MiniLM-L6-v2")
    assert e.get_dimensions() == 8
    v = e.embed("hello world")
    assert v.shape == (8,)
    batch = e.embed_batch(pd.Series(["a", "b", "a"]))
    assert len(batch) == 3
    assert batch.iloc[0] == batch.iloc[2]  # deterministic per text
    assert all(len(row) == 8 for row in batch)


def test_sentence_transformers_via_registry(fake_st):
    e = get_embedder("SentenceTransformersEmbedder", model_name="all-MiniLM-L6-v2")
    assert isinstance(e, SentenceTransformersEmbedder)
    assert e.get_dimensions() == 8


def test_openai_contract(fake_openai):
    e = OpenAIEmbedder("text-embedding-3-small", api_key="sk-test")
    assert e.get_dimensions() == 1536
    v = e.embed("hello")
    assert isinstance(v, np.ndarray) and v.shape == (1536,)
    batch = e.embed_batch(pd.Series(["x", "y"]))
    assert len(batch) == 2 and len(batch.iloc[0]) == 1536


def test_openai_list_input_one_call_per_chunk():
    """Reference embedders.py:53,68-71: embed() accepts Union[str,
    List[str]] — a str returns a 1-D vector, a list one 2-D matrix from a
    SINGLE API request; embed_batch sends ONE request per Arrow chunk
    (U4's batching contract), not one per row.  The injected client makes
    this testable without the openai dep."""
    client = _FakeOpenAIClient(api_key="sk-di")
    e = OpenAIEmbedder("text-embedding-3-small", client=client)
    mat = e.embed(["a", "b", "c"])
    assert mat.shape == (3, 1536)
    assert len(client.calls) == 1 and client.calls[0][0] == ["a", "b", "c"]

    chunk = pd.Series(["t0", "t1", "t2", "t3", "t4"], index=[7, 8, 9, 10, 11])
    out = e.embed_batch(chunk)
    assert len(client.calls) == 2  # exactly one more request for 5 rows
    assert client.calls[1][0] == ["t0", "t1", "t2", "t3", "t4"]
    assert list(out.index) == [7, 8, 9, 10, 11]  # Arrow alignment preserved
    assert all(len(row) == 1536 for row in out)
    # rows map to their own response entries, in order
    assert out.iloc[1][0] != out.iloc[0][0]

    empty = e.embed_batch(pd.Series([], dtype=object))
    assert len(empty) == 0 and len(client.calls) == 2  # no call for nothing


def test_openai_optional_params_forwarded_only_when_set():
    """user / dimensions / encoding_format reach the request only when the
    caller set them (reference embedders.py:55-63, minus its self.dims
    crash)."""
    client = _FakeOpenAIClient()
    e = OpenAIEmbedder(
        "text-embedding-3-large",
        client=client,
        dimensions=256,
        user="u1",
        encoding_format="float",
    )
    assert e.get_dimensions() == 256
    v = e.embed("x")
    assert v.shape == (256,)
    assert client.calls[0][1] == {
        "dimensions": 256,
        "user": "u1",
        "encoding_format": "float",
    }
    plain = OpenAIEmbedder("text-embedding-3-small", client=client)
    plain.embed("y")
    assert client.calls[1][1] == {}


def test_openai_kwargs_actually_bound(fake_openai):
    """Reference bug #5: OpenAIEmbedder never assigned its kwargs, so
    get_dimensions() crashed on the unset attribute (reference
    embedders.py:36-71).  Our port binds them — a dimensions override and
    the api_key must round-trip."""
    e = OpenAIEmbedder("text-embedding-3-large", api_key="sk-k", dimensions=256)
    assert e.get_dimensions() == 256
    assert e._client.api_key == "sk-k"
    # and without the override, the model table wins
    assert OpenAIEmbedder("text-embedding-3-large", api_key="k").get_dimensions() == 3072


def test_missing_dep_raises_importerror(monkeypatch):
    """Without the optional dep the constructor fails with ImportError
    (not AttributeError/NameError) — the documented gate."""
    monkeypatch.setitem(sys.modules, "openai", None)
    monkeypatch.setitem(sys.modules, "sentence_transformers", None)
    with pytest.raises(ImportError):
        OpenAIEmbedder("text-embedding-3-small")
    with pytest.raises(ImportError):
        SentenceTransformersEmbedder("all-MiniLM-L6-v2")


# --------------------------------------------- real-dep tests (skip here)


@pytest.mark.skipif(not HAS_ST, reason="sentence_transformers not installed")
def test_sentence_transformers_real():  # pragma: no cover - dep absent here
    e = SentenceTransformersEmbedder("all-MiniLM-L6-v2")
    assert e.get_dimensions() == 384
    assert e.embed("hello").shape == (384,)


@pytest.mark.skipif(not HAS_OPENAI, reason="openai not installed")
def test_openai_real_construction():  # pragma: no cover - dep absent here
    e = OpenAIEmbedder("text-embedding-3-small", api_key="sk-dummy")
    assert e.get_dimensions() == 1536


# ------------------------------------------------------- hermetic baseline


def test_hashing_embedder_matches_registry():
    a = HashingEmbedder(dim=32)
    b = get_embedder("HashingEmbedder", dim=32)
    t = "the same text"
    assert np.allclose(a.embed(t), b.embed(t))
    assert a.get_dimensions() == 32
    assert abs(float(np.linalg.norm(a.embed(t))) - 1.0) < 1e-5


def test_openai_oversized_chunk_splits_at_request_cap():
    """The embeddings endpoint caps list inputs at 2048 items per request;
    a ~10k-row Arrow chunk must map to several bounded calls (each within
    the cap), with the returned matrix row-aligned across the splits —
    never one oversized request that would 400 in production."""
    client = _FakeOpenAIClient()
    e = OpenAIEmbedder("text-embedding-3-small", client=client, dimensions=4)
    n = 2048 * 2 + 5
    out = e.embed_batch(pd.Series([f"t{i}" for i in range(n)]))
    assert len(out) == n
    assert len(client.calls) == 3
    sizes = [len(c[0]) for c in client.calls]
    assert sizes == [2048, 2048, 5]
    # row alignment survives the concatenation: the first row of each
    # split maps to that request's first response entry (0.25 exactly)
    assert out.iloc[0][0] == out.iloc[2048][0] == out.iloc[4096][0]
    # order within a split preserved
    assert out.iloc[1][0] > out.iloc[0][0]


def test_model_loads_once_per_worker(spark, tmp_path):
    """U5 economics pin (the reference's @modal.enter per-container model
    load, embedders.py:81-84): the embedder is constructed ONCE per python
    WORKER PROCESS — not once per Arrow batch, not once per task — via the
    sys.modules-stashed process cache (a closure singleton would reset on
    every task's closure deserialization).  Proven with a counting
    heavy-init mock over a multi-partition, multi-batch, multi-action
    load."""
    import os
    import uuid as _uuid

    from pyspark.sql import functions as F

    from modal_vector_db_spark import embedders as emb

    marker = str(tmp_path / f"loads_{_uuid.uuid4().hex[:6]}")
    os.makedirs(marker, exist_ok=True)

    class CountingEmbedder(emb.HashingEmbedder):
        def __init__(self, model_name="counting", marker_dir=None, **kw):
            super().__init__(model_name, **kw)
            path = os.path.join(marker_dir, f"{os.getpid()}-{_uuid.uuid4().hex}")
            with open(path, "w"):
                pass  # one marker file per CONSTRUCTION, named by worker pid

    emb.EMBEDDERS["CountingEmbedder"] = CountingEmbedder
    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        udf = emb.embed_udf("CountingEmbedder", dim=16, marker_dir=marker)
        df = spark.range(2000).selectExpr("concat('t', id) AS text").repartition(16)
        out = df.select(udf("text").alias("e"))
        # two ACTIONS -> 32 tasks -> ~250 Arrow batches at 16 rows/batch;
        # sum(size) forces the udf column (count() would prune it)
        for _ in range(2):
            assert out.agg(F.sum(F.size("e"))).head()[0] == 2000 * 16
        loads = os.listdir(marker)
        pids = {f.split("-")[0] for f in loads}
        assert len(loads) == len(pids), "a worker constructed the model twice"
        # bounded by the worker POOL (local[32] reuses pooled processes
        # across the two actions), nowhere near the ~250 Arrow batches
        assert len(loads) <= 32
        assert len(loads) < 250
    finally:
        emb.EMBEDDERS.pop("CountingEmbedder", None)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)
