"""PageRank tests: hand-computed golden on a tiny graph, broadcast/join
strategy equivalence, and structural invariants (sink floor, hub boost)."""

import numpy as np
import pyarrow as pa
import pytest


def _pages_ds(edges: dict[str, list[str]]):
    """Build a pages table whose html carries exactly the given links."""
    import ray.data

    urls = sorted(edges)
    html = [
        ("".join(f'<a href="{t}">x</a>' for t in edges[u])).encode()
        for u in urls
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(html, pa.binary()),
            }
        )
    )


def _reference_pagerank(edges: dict[str, list[str]], iters=5, d=0.85):
    nodes = sorted(edges)
    idx = {u: i for i, u in enumerate(nodes)}
    dedup = {u: sorted({t for t in edges[u] if t in idx}) for u in nodes}
    out = {u: len(dedup[u]) for u in nodes}
    r = np.ones(len(nodes))
    for _ in range(iters):
        s = np.zeros(len(nodes))
        for u in nodes:
            if out[u]:
                for t in dedup[u]:
                    s[idx[t]] += r[idx[u]] / out[u]
        r = (1 - d) + d * s
    return dict(zip(nodes, r))


GRAPH = {
    "https://a.org/1": ["https://b.org/2", "https://c.org/3", "https://x.org/gone"],
    "https://b.org/2": ["https://c.org/3", "https://c.org/3"],  # dup edge
    "https://c.org/3": ["https://a.org/1"],
    "https://d.org/4": ["https://c.org/3"],
    "https://e.org/5": [],  # sink: no out-links
}


def test_pagerank_matches_reference_iteration(ray_session):
    from shaclapi_ray.pipelines.graph import pagerank

    got = (
        pagerank(_pages_ds(GRAPH), strategy="broadcast")
        .to_pandas()
        .set_index("url")["pr"]
    )
    want = _reference_pagerank(GRAPH)
    assert set(got.index) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-12, u
    # structure: c (3 inbound) outranks b (1 inbound); nodes with no
    # inbound sit exactly on the teleport floor
    assert got["https://c.org/3"] > got["https://b.org/2"]
    assert abs(got["https://e.org/5"] - 0.15) < 1e-12
    assert abs(got["https://d.org/4"] - 0.15) < 1e-12


def test_pagerank_join_equals_broadcast(ray_session):
    from shaclapi_ray.pipelines.graph import pagerank

    a = (
        pagerank(_pages_ds(GRAPH), strategy="broadcast")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        pagerank(_pages_ds(GRAPH), strategy="join", num_partitions=4)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert (a.url == b.url).all()
    assert np.allclose(a.pr, b.pr, atol=1e-12)


def test_pagerank_empty_edges(ray_session):
    from shaclapi_ray.pipelines.graph import pagerank

    graph = {"https://a.org/1": [], "https://b.org/2": []}
    for strategy in ("broadcast", "join"):
        df = pagerank(_pages_ds(graph), strategy=strategy).to_pandas()
        assert len(df) == 2
        assert np.allclose(df.pr, 0.15)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

CC_GRAPH = {
    # component 1: a1 <-> b2, b2 -> c3 (plus dangling external link)
    "https://a.org/1": ["https://b.org/2", "https://x.org/gone"],
    "https://b.org/2": ["https://a.org/1", "https://c.org/3"],
    "https://c.org/3": [],
    # component 2: d4 -> e5
    "https://d.org/4": ["https://e.org/5"],
    "https://e.org/5": [],
    # isolated
    "https://f.org/6": [],
}

CC_WANT = {
    "https://a.org/1": "https://a.org/1",
    "https://b.org/2": "https://a.org/1",
    "https://c.org/3": "https://a.org/1",
    "https://d.org/4": "https://d.org/4",
    "https://e.org/5": "https://d.org/4",
    "https://f.org/6": "https://f.org/6",
}


def test_connected_components_local(ray_session):
    from shaclapi_ray.pipelines.graph import connected_components

    got = (
        connected_components(_pages_ds(CC_GRAPH), strategy="local")
        .to_pandas()
        .set_index("url")["component"]
        .to_dict()
    )
    assert got == CC_WANT


def test_connected_components_propagate_equals_local(ray_session):
    from shaclapi_ray.pipelines.graph import connected_components

    got = (
        connected_components(
            _pages_ds(CC_GRAPH), strategy="propagate", num_partitions=4
        )
        .to_pandas()
        .set_index("url")["component"]
        .to_dict()
    )
    assert got == CC_WANT


def test_connected_components_long_chain(ray_session):
    """A chain longer than the round budget: propagate stops at the
    K-hop label (matching the fixed-round oracle); local is exact."""
    from shaclapi_ray.pipelines.graph import connected_components

    n = 6
    urls = [f"https://c.org/{i}" for i in range(n)]
    chain = {u: ([urls[i + 1]] if i + 1 < n else []) for i, u in enumerate(urls)}

    local = (
        connected_components(_pages_ds(chain), strategy="local")
        .to_pandas()
        .set_index("url")["component"]
        .to_dict()
    )
    assert local == {u: urls[0] for u in urls}

    two_hop = (
        connected_components(
            _pages_ds(chain), strategy="propagate", rounds=2, num_partitions=4
        )
        .to_pandas()
        .set_index("url")["component"]
        .to_dict()
    )
    assert two_hop == {u: urls[max(0, i - 2)] for i, u in enumerate(urls)}

    converged = (
        connected_components(
            _pages_ds(chain), strategy="propagate", rounds=50, num_partitions=4
        )
        .to_pandas()
        .set_index("url")["component"]
        .to_dict()
    )
    assert converged == local
