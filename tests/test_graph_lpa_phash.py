"""Invariants for graph_label_propagation and mm_phash_dedup — each
hash-matched against its oracle, plus a formulation-INDEPENDENT
pure-Python rederivation so op and oracle can't share a bug."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from un_datapipeline_spark.registry import all_operators

OPS = all_operators()


def _copurchase_edges(sf_dir: str) -> set[tuple[int, int]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                    FROM read_parquet('{sf_dir}/lineitem.parquet'))
        SELECT a.l_partkey, b.l_partkey
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
        """
    ).fetchall()
    return {(int(u), int(v)) for u, v in rows}


def test_lpa_matches_pure_python_rederivation(spark, sf_smoke):
    """Synchronous LPA re-run in plain Python dicts over the same edge
    set must produce the identical community-size profile."""
    edges = _copurchase_edges(sf_smoke)
    adj: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    lbl = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n, nbrs in adj.items():
            c = Counter(lbl[m] for m in nbrs)
            top = max(c.values())
            nxt[n] = min(l for l, k in c.items() if k == top)
        lbl = nxt
    comm: dict[int, list[int]] = defaultdict(list)
    for n, l in lbl.items():
        comm[l].append(n)
    expect = sorted(
        ((l, len(ns), min(ns), max(ns)) for l, ns in comm.items()),
        key=lambda r: (-r[1], r[0]),
    )[:20]
    rows = OPS["graph_label_propagation"].fn(spark, sf_smoke).collect()
    got = [(r["community"], r["n_nodes"], r["min_node"], r["max_node"]) for r in rows]
    assert got == expect


def test_lpa_communities_partition_the_node_set(spark, sf_smoke):
    """Within the top-20 report: sizes are positive, labels are node
    ids from the graph, and the total reported membership can't exceed
    the node count."""
    edges = _copurchase_edges(sf_smoke)
    nodes = {n for e in edges for n in e}
    rows = OPS["graph_label_propagation"].fn(spark, sf_smoke).collect()
    assert rows
    assert sum(r["n_nodes"] for r in rows) <= len(nodes)
    for r in rows:
        assert r["n_nodes"] >= 1
        assert r["community"] in nodes
        assert r["min_node"] <= r["max_node"]


def _dhash_bands(text: str) -> tuple[int, int, int, int]:
    """Pure-Python dHash over the tiled 72x64 canvas (the operator's
    documented formula, rederived independently)."""
    n = len(text)
    px = lambda pos: ord(text[pos % n])  # noqa: E731
    bands = []
    for i in range(4):
        val = 0
        for k in range(16):
            t = i * 16 + k
            r, c = divmod(t, 8)
            pa = px(8 * r * 72 + 8 * c)
            pb = px(8 * r * 72 + 8 * (c + 1))
            if pb > pa:
                val |= 1 << k
        bands.append(val)
    return tuple(bands)


def test_phash_bands_match_pure_python(spark, sf_smoke):
    """The SQL band expressions must agree byte-for-byte with a plain
    Python rederivation of the dHash on every document."""
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    from un_datapipeline_spark.operators.multimodal import _ph_band

    band_sql = ", ".join(f"{_ph_band(i)} AS b{i}" for i in range(4))
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            f"SELECT doc_id, {band_sql} "
            f"FROM read_parquet('{sf_smoke}/documents.parquet')"
        ).fetchall()
    }
    for doc_id, text in docs:
        assert got[doc_id] == _dhash_bands(text), doc_id
    # identical payloads always hash identically (distance-0 recall)
    by_text: dict[str, set[tuple]] = defaultdict(set)
    for doc_id, text in docs:
        by_text[text].add(got[doc_id])
    assert all(len(hs) == 1 for hs in by_text.values())


def test_phash_profile_is_consistent(spark, sf_smoke):
    """4 band rows; collision accounting is internally consistent:
    collision docs ≤ corpus size, candidate pairs ≥ near pairs, and a
    bucket of size c contributes c·(c−1)/2 candidates."""
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchone()[0]
    rows = OPS["mm_phash_dedup"].fn(spark, sf_smoke).collect()
    assert [r["band"] for r in rows] == [0, 1, 2, 3]
    for r in rows:
        assert 1 <= r["n_buckets"] <= n_docs
        assert r["n_collision_docs"] <= n_docs
        assert r["n_near_pairs"] <= r["n_cand_pairs"]
        assert r["max_bucket"] >= 1


def test_modularity_matches_pure_python(spark, sf_smoke):
    """Q recomputed exactly (Fraction arithmetic) from the pure-Python
    LPA labels must equal the operator's q_num / rounded Q."""
    from fractions import Fraction
    from math import floor

    edges = _copurchase_edges(sf_smoke)
    adj: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    lbl = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n, nbrs in adj.items():
            c = Counter(lbl[m] for m in nbrs)
            top = max(c.values())
            nxt[n] = min(l for l, k in c.items() if k == top)
        lbl = nxt
    m = len(edges)
    e_in: Counter = Counter()
    for u, v in edges:
        if lbl[u] == lbl[v]:
            e_in[lbl[u]] += 1
    d_sum: Counter = Counter()
    for n, nbrs in adj.items():
        d_sum[lbl[n]] += len(nbrs)
    q_num = sum(4 * m * e_in[l] - d_sum[l] ** 2 for l in d_sum)
    row = OPS["graph_modularity"].fn(spark, sf_smoke).collect()[0]
    assert row["m_edges"] == m
    assert row["n_communities"] == len(d_sum)
    assert row["q_num"] == q_num
    q = Fraction(q_num, 4 * m * m)
    assert row["modularity"] == floor(float(q) * 1_000_000 + 0.5) / 1_000_000
    # a 3-round LPA partition on a real graph: valid modularity range
    assert -0.5 <= row["modularity"] <= 1.0
