"""Star-contraction connected components vs label propagation —
identical components on the shapes that stress each algorithm."""

from __future__ import annotations

from joblink_etl_spark.operators import dedup as D


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a BIGINT, id_b BIGINT")


def _labels(df):
    return {r["node"]: r["cluster_id"] for r in df.collect()}


class TestStarContraction:
    def test_path_graph(self, spark):
        # a long path is propagation's worst case (diameter rounds);
        # star contraction must still converge to one component
        n = 60
        e = _edges(spark, [(i, i + 1) for i in range(n)])
        lbl = _labels(D.connected_components_star(e))
        assert set(lbl.values()) == {0}
        assert len(lbl) == n + 1

    def test_giant_star_plus_clique_plus_singles(self, spark):
        pairs = [(0, i) for i in range(1, 40)]              # giant star at 0
        pairs += [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]  # clique
        pairs += [(200, 201), (300, 301)]                   # small comps
        e = _edges(spark, pairs)
        lbl = _labels(D.connected_components_star(e))
        assert all(lbl[i] == 0 for i in range(40))
        assert all(lbl[i] == 100 for i in range(100, 105))
        assert lbl[200] == 200 and lbl[201] == 200
        assert lbl[300] == 300 and lbl[301] == 300

    def test_matches_label_propagation(self, spark):
        # deterministic pseudo-random graph; both engines must agree
        # on every node's component
        pairs = [((i * 7919) % 97, (i * 104729) % 97) for i in range(160)]
        pairs = [(a, b) for a, b in pairs if a != b]
        e = _edges(spark, pairs)
        star = _labels(D.connected_components_star(e))
        prop = _labels(D.connected_components(e))
        assert star == prop

    def test_resolver_contract(self, spark):
        e = _edges(spark, [(5, 9), (9, 2), (30, 31)])
        rows = {r["doc_id"]: r for r in D.resolve_duplicates_star(e).collect()}
        assert rows[2]["cluster_id"] == 2 and rows[2]["is_canonical"]
        assert rows[5]["cluster_id"] == 2 and not rows[5]["is_canonical"]
        assert rows[9]["cluster_id"] == 2 and not rows[9]["is_canonical"]
        assert rows[30]["is_canonical"] and not rows[31]["is_canonical"]
