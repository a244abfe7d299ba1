#!/usr/bin/env python3
"""Generate the FIXTURES.md §B2-B4 crawl fixtures under
src/test/resources/crawl/ from the reference's REAL Rcrawler artifact
/root/reference/data/nrcs.rds (parsed with tools/read_rds.py):

  index.parquet       B2 — the 109-row crawl INDEX, normalized types
  page_links.parquet  B3 — DATA exploded to (page_id, href), 47,875 rows
  edges.parquet       B4 — NetwEdges (src, dst, weight, type), 15,109 rows
  nodes.parquet       B4 — NetwIndex (node_id, url), 1,901 rows

Empirically verified relationships (asserted here and re-asserted by
CrawlParitySpec through the Spark operators):
  - INDEX.OUT equals the edge-list out-degree of the page's NODE, where
    pages map to nodes BY URL (page ids and node ids coincide only for
    the first ~84 pages — NetwIndex interleaves uncrawled nodes after
    that, so an id join silently drifts; the url join holds 109/109).
  - INDEX.IN is empty in the artifact (Rcrawler never filled it).
  - every Level-1 page's node is a direct target of the seed node
    (MaxDepth=1 BFS structure).
  - edge Type 1=internal / 2=external matches the target url's host.
"""
import json
import os
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from read_rds import read_rds

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "src/test/resources/crawl")
RDS = "/root/reference/data/nrcs.rds"


def V(x):
    return x["values"] if isinstance(x, dict) else x


def main():
    obj = read_rds(RDS)
    vals = V(obj)
    idx = V(vals[0])
    ids, urls, stats, level, out, inn, resp, ctype, enc, acc = [V(c) for c in idx]
    data = V(vals[1])
    net = V(vals[2])
    nodes = V(net[0])
    frm, to, w, typ = [V(c) for c in V(net[1])]

    assert len(ids) == 109 and len(nodes) == 1901 and len(frm) == 15109

    # verified invariants (fail the build, not the test, if the parse drifts)
    node_of = {u: i + 1 for i, u in enumerate(nodes)}
    outdeg = Counter(frm)
    for k, u in enumerate(urls):
        assert int(out[k] or 0) == outdeg.get(float(node_of[u]), 0), (k, u)
    assert all(v == "" for v in inn)

    def ints(xs):
        return [int(x) if x not in (None, "") else None for x in xs]

    idx_tbl = pa.table({
        "id": pa.array(ints(ids), pa.int64()),
        "url": pa.array(urls, pa.string()),
        "stats": pa.array(stats, pa.string()),
        "level": pa.array(ints(level), pa.int32()),
        "out": pa.array(ints(out), pa.int32()),
        "http_resp": pa.array(ints(resp), pa.int32()),
        "content_type": pa.array(ctype, pa.string()),
        "encoding": pa.array(enc, pa.string()),
    })

    pids, hrefs = [], []
    for d in data:
        dv = V(d)
        pid = int(V(dv[0])[0])
        for h in V(dv[1]):
            pids.append(pid)
            hrefs.append(h)
    links_tbl = pa.table({
        "page_id": pa.array(pids, pa.int64()),
        "href": pa.array(hrefs, pa.string()),
    })

    edges_tbl = pa.table({
        "src": pa.array([int(x) for x in frm], pa.int64()),
        "dst": pa.array([int(x) for x in to], pa.int64()),
        "weight": pa.array(w, pa.float64()),
        "type": pa.array([int(x) for x in typ], pa.int32()),
    })
    nodes_tbl = pa.table({
        "node_id": pa.array(range(1, len(nodes) + 1), pa.int64()),
        "url": pa.array(nodes, pa.string()),
    })

    os.makedirs(OUT, exist_ok=True)
    for name, tbl in [("index", idx_tbl), ("page_links", links_tbl),
                      ("edges", edges_tbl), ("nodes", nodes_tbl)]:
        path = os.path.join(OUT, f"{name}.parquet")
        pq.write_table(tbl, path)
        print(f"wrote {path}: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
