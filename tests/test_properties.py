"""Property-based tests (hypothesis) for the pure-Python kernels, plus
randomized Spark-vs-pandas cross-checks for the exact operators — the
reference's own test strategy (golden outputs + randomized inputs,
SURVEY.md §5) adapted to property form."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tsv_utils_spark.functions.grapheme import count_graphemes


class TestGraphemeProperties:
    @given(st.text(max_size=200))
    @settings(max_examples=300, deadline=None)
    def test_total_and_bounded(self, s):
        n = count_graphemes(s)
        assert 0 <= n <= len(s)
        assert (n == 0) == (len(s) == 0)

    @given(st.text(alphabet=st.characters(min_codepoint=0x20,
                                          max_codepoint=0x7E),
                   max_size=100))
    @settings(max_examples=100, deadline=None)
    def test_printable_ascii_is_codepoints(self, s):
        assert count_graphemes(s) == len(s)

    @given(st.text(max_size=80), st.text(max_size=80))
    @settings(max_examples=200, deadline=None)
    def test_concat_subadditive(self, a, b):
        # joining can only merge clusters at the seam, never split them
        n = count_graphemes(a + b)
        assert n <= count_graphemes(a) + count_graphemes(b)
        if a and b:
            assert n >= max(count_graphemes(a), 1)


class TestCountMinProperties:
    @given(st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_never_underestimates(self, values):
        from collections import Counter

        from tsv_utils_spark.sketches.countmin import CountMin

        cm = CountMin(depth=4, width=1 << 8, max_candidates=32)
        cm.update(np.asarray(values, dtype=object))
        truth = Counter(values)
        for v, true_n in truth.items():
            assert cm.count(v) >= true_n  # CM is one-sided

    @given(st.lists(st.sampled_from("abcd"), min_size=1, max_size=100),
           st.lists(st.sampled_from("abcd"), min_size=1, max_size=100))
    @settings(max_examples=30, deadline=None)
    def test_merge_equals_union_update(self, xs, ys):
        from tsv_utils_spark.sketches.countmin import CountMin

        a = CountMin(depth=4, width=1 << 8)
        a.update(np.asarray(xs, dtype=object))
        b = CountMin(depth=4, width=1 << 8)
        b.update(np.asarray(ys, dtype=object))
        a.merge(b)
        both = CountMin(depth=4, width=1 << 8)
        both.update(np.asarray(xs + ys, dtype=object))
        assert np.array_equal(a.table, both.table)


class TestHLLProperties:
    @given(st.sets(st.integers(min_value=0, max_value=10**12),
                   min_size=1, max_size=2000))
    @settings(max_examples=30, deadline=None)
    def test_error_within_published_bound(self, values):
        from tsv_utils_spark.sketches.hll import HyperLogLog

        h = HyperLogLog(p=12)
        h.update(np.fromiter(values, dtype=np.int64))
        est = h.estimate()
        n = len(values)
        # 1.04/sqrt(2^12) ~ 1.6%; allow 5 sigma (sparse phase is exact)
        assert abs(est - n) <= max(1.0, 5 * 1.04 / np.sqrt(1 << 12) * n)


@pytest.mark.parametrize("seed", [1, 2, 3])
class TestSummarizeVsPandas:
    def test_random_frames(self, spark, seed):
        from tsv_utils_spark.operators import Op, summarize

        rng = np.random.default_rng(seed)
        n = 400
        pdf = pd.DataFrame({
            "g": rng.choice(["a", "b", "c", None], n).astype(object),
            "x": rng.normal(100, 30, n).round(3),
            "s": rng.choice(["u", "v", "w", ""], n).astype(object),
        })
        pdf.loc[rng.choice(n, 30, replace=False), "x"] = np.nan
        df = spark.createDataFrame(pdf)
        out = summarize(df, ["g"], [
            Op.count(header="n"),
            Op.sum("x", header="sx"),
            Op.min("x", header="mn"),
            Op.max("x", header="mx"),
            Op.mean("x", header="avg"),
            Op.unique_count("s", header="us"),
        ]).toPandas().set_index("g")
        grp = pdf.groupby("g", dropna=False)
        for key, sub in grp:
            k = None if (isinstance(key, float) and np.isnan(key)) or \
                key is None else key
            row = out.loc[k] if k is not None else \
                out[out.index.isnull()].iloc[0]
            assert row["n"] == len(sub)
            if sub["x"].notna().any():
                assert row["sx"] == pytest.approx(sub["x"].sum(), rel=1e-9)
                assert row["mn"] == pytest.approx(sub["x"].min())
                assert row["mx"] == pytest.approx(sub["x"].max())
                assert row["avg"] == pytest.approx(sub["x"].mean(), rel=1e-9)
            # unique_count counts distinct non-null values incl. ""
            assert row["us"] == sub["s"].dropna().nunique()

    def test_filter_predicates(self, spark, seed):
        from tsv_utils_spark.operators import Predicates as P, tsv_filter

        rng = np.random.default_rng(seed + 100)
        n = 300
        pdf = pd.DataFrame({
            "v": rng.integers(-50, 50, n).astype(str),
            "t": [("x" * int(k)) for k in rng.integers(0, 12, n)],
        })
        df = spark.createDataFrame(pdf)
        got = tsv_filter(df, [P.num("v", "ge", 0),
                              P.char_len("t", "le", 5)]).toPandas()
        want = pdf[(pdf["v"].astype(int) >= 0) & (pdf["t"].str.len() <= 5)]
        assert len(got) == len(want)
        assert sorted(got["v"].astype(int)) == sorted(want["v"].astype(int))


class TestCodecProperties:
    @given(st.integers(1, 40), st.integers(1, 40),
           st.sampled_from([None, 3, 4]), st.integers(0, 2**32 - 1))
    @settings(max_examples=60, deadline=None)
    def test_image_roundtrip_any_shape(self, h, w, ch, seed):
        from tsv_utils_spark.functions.codecs import (
            bmp_decode,
            bmp_encode,
            png_decode,
            png_encode,
        )

        rng = np.random.default_rng(seed)
        shape = (h, w) if ch is None else (h, w, ch)
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (png_decode(png_encode(px)) == px).all()
        if ch != 4:  # BMP carries gray/RGB only
            assert (bmp_decode(bmp_encode(px)) == px).all()

    @given(st.integers(1, 5000), st.sampled_from([1, 2]),
           st.sampled_from([8000, 16000, 44100]),
           st.integers(0, 2**32 - 1))
    @settings(max_examples=40, deadline=None)
    def test_wav_roundtrip_any_length(self, n, ch, rate, seed):
        from tsv_utils_spark.functions.codecs import wav_decode, wav_encode

        rng = np.random.default_rng(seed)
        shape = (n,) if ch == 1 else (n, 2)
        pcm = rng.integers(-32768, 32768, shape).astype(np.int16)
        back, r = wav_decode(wav_encode(pcm, rate=rate))
        assert r == rate and back.shape == pcm.shape and (back == pcm).all()


class TestTsvRoundtripProperties:
    # TSV-safe cell: no TAB/CR/LF (the format reserves them) and no NUL
    # (write_tsv's quote-less mode repurposes U+0000 as the never-
    # matching quote char — documented limitation); anything else —
    # quotes, backslashes, unicode, leading/trailing whitespace — must
    # survive write_tsv -> read_tsv byte-identically
    # \x01 additionally excluded: it is the redirected comment char
    # (see write_tsv) and inherits univocity's line-start quoting quirk
    _cell = st.text(
        alphabet=st.characters(blacklist_characters="\t\r\n\x00\x01",
                               blacklist_categories=("Cs",)),
        min_size=0, max_size=12)

    @given(st.lists(st.tuples(_cell, _cell), min_size=1, max_size=25),
           st.integers(0, 3))
    @settings(max_examples=25, deadline=None)
    def test_write_read_identity(self, spark, tmp_path_factory, rows, salt):
        from tsv_utils_spark.sources.tsv import read_tsv, write_tsv

        # cells that equal the header line's fields would exercise the
        # documented header-collision rule, not the format — avoid the
        # exact header pair, keep everything else
        rows = [r for r in rows if r != ("a", "b")]
        if not rows:
            rows = [("x", "y")]
        # Spark CSV writer emits NULL for empty string unless emptyValue
        # is set (write_tsv sets it) — empty cells are the point here
        pdf = pd.DataFrame(rows, columns=["a", "b"])
        df = spark.createDataFrame(pdf)
        out = str(tmp_path_factory.mktemp("tsvprop") / f"t{salt}")
        write_tsv(df, out)
        back = read_tsv(spark, out, exact_header=True)
        got = sorted((r[0] or "", r[1] or "") for r in back.collect())
        want = sorted((a, b) for a, b in rows)
        assert got == want


@pytest.mark.parametrize("seed", [11, 12, 13])
class TestAsofJoinProperties:
    def test_matches_pandas_merge_asof_with_dupes_and_nulls(
            self, spark, seed):
        # randomized corpus with left-time collisions, NULL left times,
        # both directions, with and without tolerance — every
        # combination must match pandas' merge_asof. Right times are
        # UNIQUE per key: with duplicates pandas' tie rule flips by
        # direction (backward keeps the last equal row, forward the
        # first) while ours is one deterministic right_order rule —
        # the dedicated unit test pins our tie semantics.
        from tsv_utils_spark.operators.timeseries import asof_join

        rng = np.random.default_rng(seed)
        n_l, n_r, users = 250, 120, 7
        lt = pd.DataFrame({
            "u": rng.integers(0, users, n_l),
            # coarse grid -> plenty of exact left-vs-right collisions
            "t": rng.integers(0, 500, n_l).astype("float64"),
            "lid": np.arange(n_l)})
        lt.loc[rng.choice(n_l, 10, replace=False), "t"] = np.nan
        rt = pd.DataFrame({
            "u": rng.integers(0, users, n_r),
            "rt": np.sort(rng.integers(0, 500, n_r)).astype("float64"),
            "rid": np.arange(n_r)}) \
            .drop_duplicates(["u", "rt"]).reset_index(drop=True)
        L = spark.createDataFrame(lt)
        R = spark.createDataFrame(rt)
        for direction in ("backward", "forward"):
            for tol in (None, 50.0):
                got = asof_join(L, R, on=["u"], left_time="t",
                                right_time="rt", direction=direction,
                                tolerance=tol, right_order=["rid"]) \
                    .toPandas().sort_values("lid").reset_index(drop=True)
                kw = {} if tol is None else \
                    {"tolerance": 50.0, "allow_exact_matches": True}
                want = pd.merge_asof(
                    lt.dropna(subset=["t"]).sort_values(
                        ["t", "lid"], kind="mergesort"),
                    rt.sort_values(["rt", "rid"], kind="mergesort"),
                    left_on="t", right_on="rt", by="u",
                    direction=direction, **kw)
                want = pd.concat(
                    [want, lt[lt["t"].isna()]], ignore_index=True) \
                    .sort_values("lid").reset_index(drop=True)
                g = got["rid"].fillna(-1).astype("int64").tolist()
                w = want["rid"].fillna(-1).astype("int64").tolist()
                assert g == w, (direction, tol, seed)


class TestWebCorpusInvariants:
    """Property tests for the late round-5 family. Each hypothesis
    example batches its generated strings into ONE DataFrame (so an
    example costs one job, not one job per string); max_examples is
    kept small because each example still launches Spark jobs."""

    @given(st.lists(st.text(max_size=120), min_size=1, max_size=60))
    @settings(max_examples=15, deadline=None)
    def test_tokenizers_partition_text(self, spark, texts):
        # both span-dedup tokenizers must PARTITION any input —
        # concatenating the matches reproduces the text byte-exactly
        # (the property that makes removal + reassembly lossless)
        from pyspark.sql import functions as F

        from tsv_utils_spark.operators.dedup import _SENT_PAT, _WORD_PAT

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "i long, t string")
        bad = df.select(
            *[(F.array_join(
                F.regexp_extract_all(F.coalesce("t", F.lit("")),
                                     F.lit(p), F.lit(0)), "") !=
               F.coalesce("t", F.lit(""))).alias(n)
              for n, p in (("s", _SENT_PAT), ("w", _WORD_PAT))]) \
            .where("s OR w").count()
        assert bad == 0

    @given(st.lists(st.text(
        alphabet=st.sampled_from(list(
            "abcXYZ09._-:/?#&=%@ \té")), max_size=60),
        min_size=1, max_size=80))
    @settings(max_examples=15, deadline=None)
    def test_url_normalize_idempotent(self, spark, frags):
        # canonical output must be a fixed point: re-normalizing any
        # non-null canonical URL returns it unchanged
        from pyspark.sql import functions as F

        from tsv_utils_spark.operators.web import url_normalize

        urls = [f"http://{f}" for f in frags] + \
               [f"https://Host{i}.Example.com{f}" for i, f in
                enumerate(frags)] + frags
        df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                                   "i long, u string")
        canon = df.select(url_normalize("u").alias("c")) \
                  .where(F.col("c").isNotNull())
        bad = canon.select(
            (~url_normalize(F.col("c")).eqNullSafe(F.col("c"))).alias("diff"),
            "c", url_normalize(F.col("c")).alias("c2")) \
            .where("diff").collect()
        assert not bad, [(r["c"], r["c2"]) for r in bad[:5]]
