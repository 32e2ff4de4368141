"""Link-graph analytics over the pages table: distributed PageRank.

Engine addition beyond the reference's operator set (the reference stops
at referential link COUNTS — shaclapi/reduction's inter-shape edges);
PageRank exercises the iterative keyed-join pattern a large-scale web
corpus pipeline needs (host authority for quality weighting).

Graph definition (shared with the SQL oracle):
- nodes: DISTINCT non-null page urls
- edges: DISTINCT (src, dst) href pairs from html, dst restricted to
  nodes (dangling targets dropped; their mass leaks — the standard
  simplification, identical on both sides)
- unnormalized update: r0 = 1, r_{k+1}(v) = (1-d) + d * Σ_{u→v} r_k(u)/outdeg(u)
  (N × the probability-normalized PageRank — same ordering, and values
  are O(1) so 6-decimal float comparison is meaningful)

Two strategies, equivalence-tested:
- 'broadcast' (default ≤ ``PAGERANK_BROADCAST_LIMIT`` nodes): edges are
  indexed ONCE against a sorted node-hash array (stages/hashset — zero
  per-task build) into a narrow (src_idx, dst_idx) Dataset; each
  iteration is one map_batches (per-batch np.bincount partial) with
  driver-side O(N) accumulation. Rank state is O(N) on the driver BY
  CONSTRUCTION of this path — that is what the limit guards.
- 'join' (any scale): ranks stay a Dataset; each iteration is
  edges ⋈ ranks (hash shuffle) → groupby(dst).sum → left join onto
  nodes, materialized per iteration to truncate lineage. This is the
  path a 10^12-row corpus runs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from shaclapi_ray.stages.hashset import build_hash_set, hash_strings
from shaclapi_ray.stages.links import extract_links
from shaclapi_ray.stages.referential import clamp_partitions

PAGERANK_BROADCAST_LIMIT = 50_000_000
DAMPING = 0.85
ITERATIONS = 5

CC_ROUNDS = 8
CC_LOCAL_EDGE_LIMIT = 20_000_000


def _nodes_ds(pages_ds):
    """Distinct non-null urls as a 1-column Dataset (one shuffle)."""
    urls = pages_ds.map_batches(
        lambda t: pa.table({"url": t["url"].drop_null()}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return urls.groupby("url").count().select_columns(["url"])


def _distinct_edges(pages_ds, node_hashes_ref):
    """(src, dst) DISTINCT edges with dst ∈ nodes (one shuffle)."""

    def keep_internal(batch: pa.Table) -> pa.Table:
        nh = ray.get(node_hashes_ref)
        h = hash_strings(batch["target_url"])
        pos = np.minimum(np.searchsorted(nh, h), max(nh.size - 1, 0))
        mask = nh[pos] == h if nh.size else np.zeros(len(h), dtype=bool)
        t = batch.filter(pa.array(mask))
        return pa.table({"src": t["url"], "dst": t["target_url"]})

    links = extract_links(pages_ds)
    internal = links.map_batches(
        keep_internal, batch_format="pyarrow", zero_copy_batch=True
    )
    return internal.groupby(["src", "dst"]).count().select_columns(["src", "dst"])


def pagerank(
    pages_ds,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
    strategy: str = "auto",
    broadcast_limit: int = PAGERANK_BROADCAST_LIMIT,
    num_partitions: int = 32,
):
    """(url, pr): unnormalized PageRank after ``iterations`` rounds."""
    nodes = _nodes_ds(pages_ds).materialize()
    n_nodes = nodes.count()
    if strategy == "auto":
        strategy = "broadcast" if n_nodes <= broadcast_limit else "join"
    if strategy == "broadcast":
        return _pagerank_broadcast(pages_ds, nodes, iterations, damping)
    return _pagerank_join(
        pages_ds, nodes, iterations, damping, clamp_partitions(num_partitions)
    )


# ---------------------------------------------------------------------------
# broadcast (node-indexed) path
# ---------------------------------------------------------------------------

def _node_hash_array(nodes) -> np.ndarray:
    """Sorted uint64 hashes of the node urls (8 bytes/node on the driver)."""
    parts = [
        hash_strings(b["url"]) for b in nodes.iter_batches(batch_format="pyarrow")
    ]
    return np.sort(np.concatenate(parts)) if parts else np.array([], np.uint64)


def _pagerank_broadcast(pages_ds, nodes, iterations, damping):
    # sorted node-hash array: index i == rank slot i (ONE driver collect
    # of 8 bytes/node, guarded by the broadcast limit)
    node_h = _node_hash_array(nodes)
    n = node_h.size
    node_h_ref = ray.put(node_h)

    def index_edges(batch: pa.Table) -> pa.Table:
        nh = ray.get(node_h_ref)
        si = np.searchsorted(nh, hash_strings(batch["src"]))
        di = np.searchsorted(nh, hash_strings(batch["dst"]))
        return pa.table(
            {
                "si": pa.array(si.astype(np.int64)),
                "di": pa.array(di.astype(np.int64)),
            }
        )

    edges_idx = (
        _distinct_edges(pages_ds, node_h_ref)
        .map_batches(index_edges, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    outdeg = np.zeros(n, dtype=np.int64)
    for b in edges_idx.iter_batches(batch_format="pyarrow"):
        np.add.at(outdeg, np.asarray(b["si"]), 1)

    ranks = np.ones(n, dtype=np.float64)
    for _ in range(iterations):
        contrib = np.divide(
            ranks, outdeg, out=np.zeros(n), where=outdeg > 0
        )
        contrib_ref = ray.put(contrib)

        def partial(batch: pa.Table, cref=contrib_ref) -> pa.Table:
            c = ray.get(cref)
            si = np.asarray(batch["si"])
            di = np.asarray(batch["di"])
            acc = np.bincount(di, weights=c[si], minlength=0)
            nz = np.flatnonzero(acc)
            return pa.table(
                {"di": pa.array(nz.astype(np.int64)), "m": pa.array(acc[nz])}
            )

        sums = np.zeros(n, dtype=np.float64)
        parts = edges_idx.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        )
        for b in parts.iter_batches(batch_format="pyarrow"):
            np.add.at(sums, np.asarray(b["di"]), np.asarray(b["m"]))
        ranks = (1.0 - damping) + damping * sums

    ranks_ref = ray.put((node_h, ranks))

    def attach(batch: pa.Table) -> pa.Table:
        nh, r = ray.get(ranks_ref)
        idx = np.searchsorted(nh, hash_strings(batch["url"]))
        return pa.table({"url": batch["url"], "pr": pa.array(r[idx])})

    return nodes.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# join (any-scale) path
# ---------------------------------------------------------------------------

def _pagerank_join(pages_ds, nodes, iterations, damping, num_partitions):
    from shaclapi_ray.stages.joins import drop_empty_blocks

    # hash-join inputs must be sanitized (see stages/joins.py) — empty
    # blocks crash HashShuffleAggregator.finalize; nodes is non-empty
    # whenever this runs on a real table, but layouts vary
    nodes = drop_empty_blocks(nodes) or nodes

    node_hashes = build_hash_set(
        pa.concat_arrays(
            [
                b["url"].combine_chunks()
                if isinstance(b["url"], pa.ChunkedArray)
                else b["url"]
                for b in nodes.iter_batches(batch_format="pyarrow")
            ]
        )
        if nodes.count()
        else pa.array([], pa.string())
    )
    node_h_ref = ray.put(node_hashes)
    edges = _distinct_edges(pages_ds, node_h_ref)
    outdeg = edges.groupby("src").count()  # (src, count())
    edges = drop_empty_blocks(edges)
    outdeg = drop_empty_blocks(outdeg)
    if edges is None or outdeg is None:
        return nodes.map_batches(
            lambda t: pa.table(
                {"url": t["url"], "pr": pa.array(np.full(len(t), 1.0 - damping))}
            ),
            batch_format="pyarrow",
        )
    edges_od = edges.join(
        outdeg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("src",),
        right_on=("src",),
    ).materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table({"url": t["url"], "r": pa.array(np.ones(len(t)))}),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iterations):
        ranks = drop_empty_blocks(ranks) or ranks
        j = edges_od.join(
            ranks,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("url",),
        )
        contribs = j.map_batches(
            lambda t: pa.table(
                {
                    "url": t["dst"],
                    "c": pc.divide(
                        pc.cast(t["r"], pa.float64()),
                        pc.cast(t["count()"], pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sums = contribs.groupby("url").sum("c")
        sums = drop_empty_blocks(sums)
        if sums is None:
            ranks = nodes.map_batches(
                lambda t: pa.table(
                    {
                        "url": t["url"],
                        "r": pa.array(np.full(len(t), 1.0 - damping)),
                    }
                ),
                batch_format="pyarrow",
            ).materialize()
            continue
        joined = nodes.join(
            sums,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("url",),
        )
        ranks = joined.map_batches(
            lambda t: pa.table(
                {
                    "url": t["url"],
                    "r": pc.add(
                        1.0 - damping,
                        pc.multiply(
                            damping,
                            pc.fill_null(pc.cast(t["sum(c)"], pa.float64()), 0.0),
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return ranks.map_batches(
        lambda t: pa.table({"url": t["url"], "pr": t["r"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def connected_components(
    pages_ds,
    rounds: int = CC_ROUNDS,
    strategy: str = "auto",
    num_partitions: int = 32,
    local_edge_limit: int = CC_LOCAL_EDGE_LIMIT,
):
    """(url, component) over the undirected internal-link graph.

    ``component`` is the lexicographically smallest url reachable within
    ``rounds`` hops of min-label propagation; once ``rounds`` >= the
    component diameter that IS the true connected-component id. Two
    strategies, equivalence-tested:

    - 'local' (<= ``local_edge_limit`` distinct edges): collect the
      narrow (src, dst) edge list, union-find with union-by-min on the
      driver (exact at any diameter), broadcast a hash->component map
      back via ray.put.
    - 'propagate' (any scale): labels stay a Dataset; each round is one
      hash join (edges x labels) + union + groupby-min — the same plan
      as pipelines/dedup.label_propagation but with string labels so the
      result matches the SQL oracle verbatim. Early-exits at fixpoint
      (labels only decrease, so stopping early never diverges from the
      fixed-round oracle).
    """
    nodes = _nodes_ds(pages_ds).materialize()
    node_h_ref = ray.put(_node_hash_array(nodes))
    edges = _distinct_edges(pages_ds, node_h_ref).materialize()
    if strategy == "auto":
        strategy = "local" if edges.count() <= local_edge_limit else "propagate"
    if strategy == "local":
        return _cc_local(nodes, edges)
    return _cc_propagate(nodes, edges, rounds, clamp_partitions(num_partitions))


def _cc_local(nodes, edges):
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    touched: set = set()
    for b in edges.iter_batches(batch_format="pyarrow"):
        srcs = b["src"].to_pylist()
        dsts = b["dst"].to_pylist()
        touched.update(srcs)
        touched.update(dsts)
        for s, d in zip(srcs, dsts):
            rs, rd = find(s), find(d)
            if rs != rd:
                lo, hi = (rs, rd) if rs < rd else (rd, rs)
                parent[hi] = lo  # union-by-min: the root is the min url

    keys = sorted(touched)
    comps = np.array([find(u) for u in keys], dtype=object)
    h = hash_strings(pa.array(keys, pa.string())) if keys else np.array([], np.uint64)
    order = np.argsort(h, kind="stable")
    map_ref = ray.put((h[order], comps[order]))

    def attach(batch: pa.Table) -> pa.Table:
        hk, cv = ray.get(map_ref)
        urls = batch["url"]
        own = urls.to_numpy(zero_copy_only=False)
        out = own.copy()
        if hk.size:
            hh = hash_strings(urls)
            pos = np.minimum(np.searchsorted(hk, hh), hk.size - 1)
            hit = hk[pos] == hh
            out[hit] = cv[pos[hit]]
        return pa.table(
            {"url": urls, "component": pa.array(out, pa.string())}
        )

    return nodes.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True)


def _cc_propagate(nodes, edges, rounds, num_partitions):
    from ray.data.aggregate import Min

    from shaclapi_ray.stages.joins import drop_empty_blocks

    labels = nodes.map_batches(
        lambda t: pa.table({"node": t["url"], "label": t["url"]}),
        batch_format="pyarrow",
    ).materialize()

    def symmetrize(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks() if isinstance(t["src"], pa.ChunkedArray) else t["src"]
        d = t["dst"].combine_chunks() if isinstance(t["dst"], pa.ChunkedArray) else t["dst"]
        return pa.table(
            {"src": pa.concat_arrays([s, d]), "dst": pa.concat_arrays([d, s])}
        )

    sym = drop_empty_blocks(edges.map_batches(symmetrize, batch_format="pyarrow"))
    if sym is None:
        return labels.map_batches(
            lambda t: pa.table({"url": t["node"], "component": t["label"]}),
            batch_format="pyarrow",
        )
    sym = sym.materialize()

    def checksum(lds) -> int:
        # labels strictly decrease until fixpoint, so an unchanged
        # uint64-wrapped hash sum means an unchanged label table
        tot = 0
        for b in lds.iter_batches(batch_format="pyarrow"):
            tot = (tot + int(hash_strings(b["label"]).sum())) % (1 << 64)
        return tot

    prev = None
    for _ in range(rounds):
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur
        lbl = labels.map_batches(
            lambda t: pa.table({"j_node": t["node"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        lbl = drop_empty_blocks(lbl) or lbl
        msgs = sym.join(
            lbl,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("j_node",),
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            labels.union(msgs)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )

    return labels.map_batches(
        lambda t: pa.table({"url": t["node"], "component": t["label"]}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# oracle
# ---------------------------------------------------------------------------

def pagerank_sql(
    pages_dir: str, iterations: int = ITERATIONS, damping: float = DAMPING
) -> str:
    """DuckDB oracle: the same graph + update rule as chained CTEs."""
    rel = f"read_parquet('{pages_dir}/part-*.parquet')"
    d = damping
    ctes = [
        f"""pg AS (SELECT url, html FROM {rel} WHERE url IS NOT NULL),
nodes AS (SELECT DISTINCT url FROM pg),
rawlinks AS (
  SELECT url AS src,
         unnest(regexp_extract_all(decode(html), 'href="([^"]+)"', 1)) AS dst
  FROM pg
),
edges AS (
  SELECT DISTINCT src, dst FROM rawlinks
  WHERE dst IN (SELECT url FROM nodes)
),
outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
r0 AS (SELECT url, 1.0::DOUBLE AS r FROM nodes)"""
    ]
    for k in range(1, iterations + 1):
        ctes.append(
            f"""r{k} AS (
  SELECT n.url, {1 - d} + {d} * COALESCE(s.m, 0) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS url, SUM(p.r / o.od) AS m
    FROM edges e JOIN r{k - 1} p ON e.src = p.url
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s USING (url)
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT url, r AS pr FROM r{iterations} ORDER BY url"
    )


def connected_components_sql(pages_dir: str, rounds: int = CC_ROUNDS) -> str:
    """DuckDB oracle: the same min-label propagation as chained CTEs.

    Propagation is monotone (labels only shrink), so running the fixed
    ``rounds`` here matches the Ray side even when it early-exits at
    fixpoint."""
    rel = f"read_parquet('{pages_dir}/part-*.parquet')"
    ctes = [
        f"""pg AS (SELECT url, html FROM {rel} WHERE url IS NOT NULL),
nodes AS (SELECT DISTINCT url FROM pg),
rawlinks AS (
  SELECT url AS src,
         unnest(regexp_extract_all(decode(html), 'href="([^"]+)"', 1)) AS dst
  FROM pg
),
edges AS (
  SELECT DISTINCT src, dst FROM rawlinks
  WHERE dst IN (SELECT url FROM nodes)
),
sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
c0 AS (SELECT url AS node, url AS label FROM nodes)"""
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""c{k} AS (
  SELECT node, min(label) AS label FROM (
    SELECT node, label FROM c{k - 1}
    UNION ALL
    SELECT e.dst AS node, p.label FROM sym e JOIN c{k - 1} p ON e.src = p.node
  ) GROUP BY node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node AS url, label AS component FROM c{rounds} ORDER BY url"
    )
