"""Dictionary-encoded string columns (strings.py + the Table integration):
encode/decode roundtrips, order-preserving codes, cross-table dictionary
unification (join / set ops / concat), aggregate typing rules, and CSV
ingestion — all oracle-tested against plain Python/numpy string handling."""

import os

import numpy as np
import pytest

import radix_sort_tpu as rst
from radix_sort_tpu import Table
from radix_sort_tpu import strings as S

WORDS = ["pear", "apple", "fig", "apple", "kiwi", "fig", "apple", "plum"]


# ---------------------------------------------------------------------------
# strings.py primitives
# ---------------------------------------------------------------------------


class TestPrimitives:
    def test_encode_roundtrip(self):
        codes, vocab = S.encode(WORDS)
        assert codes.dtype == np.uint32
        assert vocab[0] == ""  # "" always lives at index 0
        np.testing.assert_array_equal(S.decode(codes, vocab),
                                      np.array(WORDS))

    def test_codes_order_preserving(self, rng):
        data = rng.choice(["b", "aa", "z", "ab", ""], size=200)
        codes, vocab = S.encode(data)
        # sorted vocabulary => code order == lexicographic order
        order_by_code = np.argsort(codes, kind="stable")
        order_by_str = np.argsort(data, kind="stable")
        np.testing.assert_array_equal(data[order_by_code],
                                      data[order_by_str])

    def test_encode_bytes_and_object(self):
        codes, vocab = S.encode(np.array([b"x", b"y", b"x"]))
        np.testing.assert_array_equal(S.decode(codes, vocab),
                                      np.array(["x", "y", "x"]))
        codes2, vocab2 = S.encode(np.array(["a", b"b"], dtype=object))
        np.testing.assert_array_equal(S.decode(codes2, vocab2),
                                      np.array(["a", "b"]))

    def test_unify_remaps(self):
        ca, va = S.encode(["dog", "cat", "emu"])
        cb, vb = S.encode(["cat", "fox"])
        union, ra, rb = S.unify(va, vb)
        np.testing.assert_array_equal(S.decode(ra[ca], union),
                                      np.array(["dog", "cat", "emu"]))
        np.testing.assert_array_equal(S.decode(rb[cb], union),
                                      np.array(["cat", "fox"]))
        assert union[0] == ""

    def test_lookup(self):
        _, vocab = S.encode(WORDS)
        assert S.lookup(vocab, "apple") != S.NOT_FOUND
        assert S.lookup(vocab, "durian") == S.NOT_FOUND
        arr = S.lookup(vocab, ["fig", "nope"])
        assert arr[0] != S.NOT_FOUND and arr[1] == S.NOT_FOUND

    def test_is_string_data(self):
        assert S.is_string_data(["a", "b"])
        assert S.is_string_data(np.array(["a"]))
        assert not S.is_string_data(np.arange(3))
        assert not S.is_string_data([1, 2])


# ---------------------------------------------------------------------------
# Table integration
# ---------------------------------------------------------------------------


@pytest.fixture
def st():
    return Table({
        "city": ["osaka", "lima", "oslo", "lima", "cairo", "oslo"],
        "v": np.array([3, 1, 4, 1, 5, 9], np.int32),
    })


class TestTableStrings:
    def test_constructor_and_decode(self, st):
        assert st.is_string(("city")) and not st.is_string("v")
        out = st.to_numpy()
        np.testing.assert_array_equal(
            out["city"],
            np.array(["osaka", "lima", "oslo", "lima", "cairo", "oslo"]),
        )
        assert st["city"].dtype == np.uint32  # device side is codes

    def test_sort_by_string(self, st):
        out = st.sort_by("city").to_numpy()
        np.testing.assert_array_equal(
            out["city"], np.sort(np.array(
                ["osaka", "lima", "oslo", "lima", "cairo", "oslo"]))
        )
        # stability: equal keys keep input order of v
        lima = out["v"][out["city"] == "lima"]
        np.testing.assert_array_equal(lima, [1, 1])
        oslo = out["v"][out["city"] == "oslo"]
        np.testing.assert_array_equal(oslo, [4, 9])

    def test_filter_by_code(self, st):
        out = st.filter(st["city"] == st.code("city", "oslo")).to_numpy()
        np.testing.assert_array_equal(out["v"], [4, 9])
        # absent value matches nothing
        none = st.filter(st["city"] == st.code("city", "atlantis"))
        assert none.to_numpy()["v"].shape == (0,)

    def test_distinct_groupby(self, st):
        d = st.distinct(subset="city").to_numpy()
        np.testing.assert_array_equal(
            d["city"], np.array(["cairo", "lima", "osaka", "oslo"]))
        g = st.aggregate("city", {"s": ("sum", "v"),
                                  "mx": ("max", "v")}).to_numpy()
        np.testing.assert_array_equal(
            g["city"], np.array(["cairo", "lima", "osaka", "oslo"]))
        np.testing.assert_array_equal(g["s"], [5, 2, 3, 13])

    def test_string_valued_aggregate(self, st):
        g = st.aggregate(None, {"lo": ("min", "city"),
                                "hi": ("max", "city")}).to_numpy()
        assert g["lo"][0] == "cairo" and g["hi"][0] == "oslo"

    def test_numeric_only_agg_raises(self, st):
        with pytest.raises(TypeError, match="string column"):
            st.aggregate("v", {"s": ("sum", "city")})

    def test_join_unifies_dictionaries(self, st):
        # other table: overlapping but different vocabulary
        pop = Table({
            "city": ["lima", "quito", "oslo"],
            "pop": np.array([10, 2, 7], np.int32),
        })
        j, ovf = st.join(pop, "city", capacity=16)
        assert not bool(ovf)
        out = j.to_numpy()
        rows = sorted(zip(out["city"].tolist(), out["v"].tolist(),
                          out["pop"].tolist()))
        assert rows == [("lima", 1, 10), ("lima", 1, 10),
                        ("oslo", 4, 7), ("oslo", 9, 7)]

    def test_left_join_unmatched_is_null(self, st):
        pop = Table({"city": ["lima"], "pop": np.array([10], np.int32),
                     "tag": ["x"]})
        j, _ = st.join(pop, "city", capacity=16, how="left")
        out = j.to_numpy()
        # unmatched cells are SQL NULL (masked; data under the mask is "")
        for c, t in zip(out["city"], out["tag"].tolist()):
            assert t == ("x" if c == "lima" else None)

    def test_mixed_string_numeric_join_key_raises(self, st):
        other = Table({"city": np.arange(3, dtype=np.uint32),
                       "pop": np.arange(3, dtype=np.int32)})
        with pytest.raises(TypeError, match="one side only"):
            st.join(other, "city", capacity=8)

    def test_set_ops_unify(self):
        a = Table({"s": ["ant", "bee", "cow"]})
        b = Table({"s": ["bee", "doe"]})
        np.testing.assert_array_equal(
            a.union(b).to_numpy()["s"],
            np.array(["ant", "bee", "cow", "doe"]))
        np.testing.assert_array_equal(
            a.intersect(b).to_numpy()["s"], np.array(["bee"]))
        np.testing.assert_array_equal(
            a.difference(b).to_numpy()["s"], np.array(["ant", "cow"]))

    def test_concat_unifies(self):
        a = Table({"s": ["b", "a"], "v": np.array([1, 2], np.int32)})
        b = Table({"s": ["c", "a"], "v": np.array([3, 4], np.int32)})
        out = a.concat(b).to_numpy()
        np.testing.assert_array_equal(out["s"],
                                      np.array(["b", "a", "c", "a"]))

    def test_window_lag_inherits_dict(self, st):
        w = st.window({"prev": ("lag", "city", 1)}, order_by="v")
        assert w.is_string("prev")
        out = w.sort_by("v").to_numpy()
        # ordered by v: lima(1), lima(1), osaka(3), oslo(4), cairo(5), oslo(9)
        assert out["prev"][0] == ""  # lag fill decodes to ""
        with pytest.raises(TypeError, match="string column"):
            st.window({"s": ("sum", "city")}, order_by="v")

    def test_topk_and_with_columns(self, st):
        t = st.top_k(2, "city")
        out = t.to_numpy()
        np.testing.assert_array_equal(out["city"],
                                      np.array(["oslo", "oslo"]))
        t2 = st.with_columns(city=np.arange(6, dtype=np.uint32))
        assert not t2.is_string("city")  # replaced by numerics

    def test_rename_select_keep_dicts(self, st):
        r = st.rename({"city": "town"})
        assert r.is_string("town")
        assert st.select("city").is_string("city")

    def test_quantiles_on_string_raises(self, st):
        with pytest.raises(TypeError, match="string column"):
            st.quantiles("city", [0.5])

    def test_join_asof_carries_right_dict(self):
        left = Table({"t": np.array([5, 12], np.uint32)})
        right = Table({"t": np.array([3, 10], np.uint32),
                       "ev": ["boot", "run"]})
        j = left.join_asof(right, "t")
        out = j.to_numpy()
        np.testing.assert_array_equal(out["ev"], np.array(["boot", "run"]))


class TestExprStrings:
    """String-aware expression AST: col(s) compared with str literals
    resolves through the dictionary (ordering via boundary ranks), string
    col vs string col unifies dictionaries, and mixing with numbers
    raises."""

    def _t(self):
        return Table({
            "a": ["pear", "fig", "yam", "fig", "date"],
            "b": ["fig", "pear", "oat", "fig", "yam"],
            "v": np.array([1, 2, 3, 4, 5], np.int32),
        })

    def test_eq_ne_literal(self):
        from radix_sort_tpu import col
        t = self._t()
        np.testing.assert_array_equal(
            t.filter((col("a") == "fig").evaluate(t)).to_numpy()["v"],
            [2, 4])
        np.testing.assert_array_equal(
            t.filter((col("a") != "fig").evaluate(t)).to_numpy()["v"],
            [1, 3, 5])
        # absent literal matches nothing / everything respectively
        assert t.filter(
            (col("a") == "kiwi").evaluate(t)).to_numpy()["v"].size == 0
        assert t.filter(
            (col("a") != "kiwi").evaluate(t)).to_numpy()["v"].size == 5

    def test_ordering_literal(self):
        from radix_sort_tpu import col
        t = self._t()
        a = np.array(["pear", "fig", "yam", "fig", "date"])
        v = np.array([1, 2, 3, 4, 5])
        for opname, oracle in [
            ("__lt__", a < "olive"), ("__le__", a <= "fig"),
            ("__gt__", a > "fig"), ("__ge__", a >= "pear"),
        ]:
            e = getattr(col("a"), opname)(
                {"__lt__": "olive", "__le__": "fig",
                 "__gt__": "fig", "__ge__": "pear"}[opname])
            np.testing.assert_array_equal(
                t.filter(e.evaluate(t)).to_numpy()["v"], v[oracle],
                err_msg=opname)
        # boundary literal absent from the vocabulary still orders right
        e = col("a") < "goji"  # between fig and pear
        np.testing.assert_array_equal(
            t.filter(e.evaluate(t)).to_numpy()["v"], v[a < "goji"])

    def test_swapped_literal(self):
        from radix_sort_tpu import col
        t = self._t()
        a = np.array(["pear", "fig", "yam", "fig", "date"])
        v = np.array([1, 2, 3, 4, 5])
        e = "fig" < col("a")  # mirrors to col > "fig"
        np.testing.assert_array_equal(
            t.filter(e.evaluate(t)).to_numpy()["v"], v[a > "fig"])

    def test_col_vs_col_unifies(self):
        from radix_sort_tpu import col
        t = self._t()
        a = np.array(["pear", "fig", "yam", "fig", "date"])
        b = np.array(["fig", "pear", "oat", "fig", "yam"])
        v = np.array([1, 2, 3, 4, 5])
        np.testing.assert_array_equal(
            t.filter((col("a") == col("b")).evaluate(t)).to_numpy()["v"],
            v[a == b])
        np.testing.assert_array_equal(
            t.filter((col("a") < col("b")).evaluate(t)).to_numpy()["v"],
            v[a < b])

    def test_number_vs_string_raises(self):
        from radix_sort_tpu import col
        t = self._t()
        with pytest.raises(TypeError, match="meaningless"):
            (col("a") == 5).evaluate(t)
        with pytest.raises(TypeError, match="meaningless"):
            (col("a") < col("v")).evaluate(t)

    def test_code_escape_hatch(self):
        from radix_sort_tpu import col
        t = self._t()
        e = col("a") == t.code("a", "yam")
        np.testing.assert_array_equal(
            t.filter(e.evaluate(t)).to_numpy()["v"], [3])

    def test_like(self):
        from radix_sort_tpu import col
        t = self._t()
        v = np.array([1, 2, 3, 4, 5])
        # a: pear fig yam fig date
        cases = [
            ("f%", [2, 4]),       # prefix
            ("%a%", [1, 3, 5]),   # contains (pear, yam, date)
            ("_ig", [2, 4]),      # single-char wildcard
            ("yam", [3]),         # exact
            ("%", [1, 2, 3, 4, 5]),
            ("z%", []),
        ]
        for pat, exp in cases:
            got = t.filter(col("a").like(pat).evaluate(t)).to_numpy()["v"]
            np.testing.assert_array_equal(got, exp, err_msg=pat)

    def test_like_escapes_and_errors(self):
        from radix_sort_tpu import col, strings as S
        t = self._t()
        # escaped wildcards are literal; regex metachars in vocab are inert
        vocab = np.array(["", "100%", "a.b", "a_b", "axb"])
        np.testing.assert_array_equal(
            S.like_mask(vocab, "100\\%"), [False, True, False, False, False])
        np.testing.assert_array_equal(
            S.like_mask(vocab, "a\\_b"), [False, False, False, True, False])
        np.testing.assert_array_equal(
            S.like_mask(vocab, "a.b"), [False, False, True, False, False])
        np.testing.assert_array_equal(
            S.like_mask(vocab, "a_b"), [False, False, True, True, True])
        with pytest.raises(TypeError, match="string column"):
            col("v").like("f%").evaluate(t)

    def test_isin_strings(self):
        from radix_sort_tpu import col
        t = self._t()
        e = col("a").isin(["fig", "date"])
        np.testing.assert_array_equal(
            t.filter(e.evaluate(t)).to_numpy()["v"], [2, 4, 5])

    def test_lazy_pipeline_with_strings(self):
        from radix_sort_tpu import col
        t = self._t()
        out = (t.lazy()
                .filter(col("a") != "fig")
                .sort_by("a")
                .collect().to_numpy())
        np.testing.assert_array_equal(
            out["a"], np.array(["date", "pear", "yam"]))
        np.testing.assert_array_equal(out["v"], [5, 1, 3])


class TestDistTableStrings:
    """String columns over the 8-virtual-device mesh: codes shard, the
    vocabulary replicates on host; verbs must agree with the single-chip
    facade on the decoded relation."""

    def _mesh(self):
        import jax
        from jax.sharding import Mesh
        return Mesh(np.array(jax.devices()), ("x",))

    def test_dist_sort_groupby_decode(self, rng):
        from radix_sort_tpu.parallel.dist_table import DistTable
        n = 8 * 16
        cities = rng.choice(["rome", "kyiv", "lima", "oslo"], size=n)
        vals = rng.integers(0, 100, n).astype(np.int32)
        t = Table({"city": cities, "v": vals})
        d = DistTable.from_table(t, self._mesh())
        assert d.is_string("city")
        # distributed stable sort by the string column == numpy oracle
        out = d.sort_by("city").to_numpy()
        np.testing.assert_array_equal(out["city"], np.sort(cities))
        # distributed GROUP BY a string key returns decoded group names
        g = d.aggregate("city", {"s": ("sum", "v")},
                        max_groups=16).to_numpy()
        ref = {c: int(vals[cities == c].sum()) for c in np.unique(cities)}
        assert dict(zip(g["city"].tolist(), g["s"].tolist())) == ref

    def test_dist_join_unifies(self, rng):
        from radix_sort_tpu.parallel.dist_table import DistTable
        n = 8 * 8
        mesh = self._mesh()
        lv = ["ant", "bee", "cat", "dog", "emu", "fox", "gnu", "hen"]
        rv = ["cat", "dog", "emu", "fox", "gnu", "hen", "ibis", "jay"]
        left = DistTable.from_table(
            Table({"s": rng.choice(lv, size=n),
                   "v": np.arange(n, dtype=np.int32)}), mesh)
        right = DistTable.from_table(
            Table({"s": np.array(rv * (n // 8)),
                   "w": np.arange(n, dtype=np.int32)}), mesh)
        j, ovf = left.join(right, "s", capacity_per_shard=16 * n,
                           exchange_capacity_factor=8.0)
        assert not bool(ovf)
        out = j.to_numpy()
        # oracle: single-chip join on the same decoded relations
        lt = Table({"s": left.to_numpy()["s"],
                    "v": left.to_numpy()["v"]})
        rt = Table({"s": right.to_numpy()["s"],
                    "w": right.to_numpy()["w"]})
        ref, _ = lt.join(rt, "s", capacity=8 * n * 4)
        refd = ref.to_numpy()
        assert (sorted(zip(out["s"], out["v"], out["w"]))
                == sorted(zip(refd["s"], refd["v"], refd["w"])))


class TestCSV(object):
    def test_read_csv_roundtrip(self, tmp_path):
        p = os.path.join(tmp_path, "t.csv")
        with open(p, "w") as f:
            f.write("city,v,w\nosaka,3,1.5\nlima,1,2.5\nosaka,9,0.5\n")
        t = Table.from_csv(p)
        assert t.is_string("city")
        out = t.to_numpy()
        np.testing.assert_array_equal(
            out["city"], np.array(["osaka", "lima", "osaka"]))
        np.testing.assert_array_equal(out["v"], [3, 1, 9])
        np.testing.assert_allclose(out["w"], [1.5, 2.5, 0.5])
        # a pipeline over the ingested table
        g = t.aggregate("city", {"s": ("sum", "v")}).to_numpy()
        np.testing.assert_array_equal(g["city"],
                                      np.array(["lima", "osaka"]))
        np.testing.assert_array_equal(g["s"], [1, 12])

    def test_read_csv_dtype_override(self, tmp_path):
        p = os.path.join(tmp_path, "t.csv")
        with open(p, "w") as f:
            f.write("k,v\n1,2\n3,4\n")
        from radix_sort_tpu.utils.io import read_csv
        cols = read_csv(p, dtypes={"k": np.uint32})
        assert cols["k"].dtype == np.uint32
