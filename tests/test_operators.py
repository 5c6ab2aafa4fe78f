"""Extended pipeline operators over the real testdata tables: dedup,
similarity, text analysis, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datafusion_functions_json_spark.operators import (
    dedup,
    graph,
    multimodal,
    similarity,
    split,
    text,
)
from datafusion_functions_json_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_DIR, "documents").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


class TestText:
    def test_token_count_matches_python(self, documents):
        rows = documents.select("doc_id", "text", text.token_count("text").alias("n")).take(20)
        for r in rows:
            assert r.n == len(r.text.split())

    def test_char_ngrams(self, spark):
        df = spark.createDataFrame([("abcdef",)], "t string")
        grams = df.select(text.char_ngrams("t", 3).alias("g")).collect()[0].g
        assert grams == ["abc", "bcd", "cde", "def"]

    def test_vocabulary_tf_and_dfreq(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a"), (2, "a c"), (3, "")], "doc_id bigint, text string"
        )
        got = {
            r.token: (r.tf, r.dfreq)
            for r in text.vocabulary(df, "doc_id", "text").collect()
        }
        assert got == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}

    def test_redact_pii(self, spark):
        df = spark.createDataFrame(
            [("mail a.b+c@foo.org, ip 10.0.0.1, call +1 555-867-5309 ok",)],
            "t string",
        )
        r = df.select(
            text.redact_pii("t").alias("r"),
            text.pii_counts("t").alias("c"),
        ).collect()[0]
        assert r.r == "mail <EMAIL>, ip <IPV4>, call <PHONE> ok"
        assert (r.c.email, r.c.ipv4, r.c.phone) == (1, 1, 1)

    def test_redact_pii_clean_text_unchanged(self, spark):
        df = spark.createDataFrame([("no secrets here",)], "t string")
        assert (
            df.select(text.redact_pii("t").alias("r")).collect()[0].r
            == "no secrets here"
        )

    def test_chunk_documents_windows(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d e f g"), (2, ""), (3, "x")],
            "doc_id bigint, text string",
        )
        rows = text.chunk_documents(
            df, "doc_id", "text", chunk_tokens=4, overlap=1
        ).collect()
        got = {
            (r.doc_id, r.chunk_id): (r.tok_start, r.n_tokens, r.chunk_text)
            for r in rows
        }
        # len 7, window 4, stride 3, starts bounded by len-overlap=6
        assert got == {
            (1, 0): (1, 4, "a b c d"),
            (1, 1): (4, 4, "d e f g"),
            (3, 0): (1, 1, "x"),
        }
        with pytest.raises(ValueError):
            text.chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)

    def test_tf_idf_values(self, spark):
        import math

        df = spark.createDataFrame(
            [(1, "a a b"), (2, "a c")], "doc_id bigint, text string"
        )
        got = {
            (r.doc_id, r.token): (r.tf, r.tfidf)
            for r in text.tf_idf(df, "doc_id", "text").collect()
        }
        idf = lambda dfreq: math.log((1 + 2) / (1 + dfreq)) + 1
        assert got[(1, "a")] == (2, round(2 * idf(2), 6))
        assert got[(1, "b")] == (1, round(1 * idf(1), 6))
        assert got[(2, "c")] == (1, round(1 * idf(1), 6))
        assert got[(2, "a")] == (1, round(1 * idf(2), 6))

    def test_token_stats_entropy_and_repetition(self, spark):
        import math

        df = spark.createDataFrame(
            [(1, "a a a a"), (2, "a b c d"), (3, "")],
            "doc_id bigint, text string",
        )
        got = {
            r.doc_id: (r.n_tokens, r.entropy, r.top_token_frac)
            for r in text.token_stats(df, "doc_id", "text").collect()
        }
        # all-same tokens: H=0, top_frac=1; all-distinct: H=ln(4), 0.25
        assert got == {
            1: (4, 0.0, 1.0),
            2: (4, round(math.log(4), 6), 0.25),
        }

    def test_top_tokens_deterministic_tiebreak(self, spark):
        df = spark.createDataFrame(
            [(1, "z y z"), (2, "y x")], "doc_id bigint, text string"
        )
        rows = text.top_tokens(df, "doc_id", "text", k=2).collect()
        # tf: y=2, z=2, x=1 -> top-2 is (y, z) by token-asc tie order
        assert [(r.token, r.tf) for r in rows] == [("y", 2), ("z", 2)]

    def test_word_ngrams(self, spark):
        df = spark.createDataFrame([("a b c d",)], "t string")
        grams = df.select(text.word_ngrams("t", 2).alias("g")).collect()[0].g
        assert grams == ["a b", "b c", "c d"]

    def test_lang_id(self, spark):
        df = spark.createDataFrame(
            [
                ("the cat sat on the mat and it is happy",),
                ("der hund ist ein tier und das ist gut",),
                ("xyzzy plugh qwerty",),
            ],
            "t string",
        )
        langs = [r.l for r in df.select(text.lang_id("t").alias("l")).collect()]
        assert langs == ["en", "de", "und"]

    def test_quality_features(self, documents):
        r = documents.select(text.quality_features("text").alias("q")).first().q
        assert r.n_tokens > 0 and 0 <= r.alpha_ratio <= 1

    def test_quality_score_range(self, documents):
        rows = documents.select(text.quality_score("text").alias("s")).collect()
        assert all(0.0 <= r.s <= 1.0 for r in rows)

    def test_fingerprint_deterministic_and_order_sensitive(self, spark):
        df = spark.createDataFrame(
            [("a b c", "a b c"), ("a b c", "c b a")], "t1 string, t2 string"
        )
        rows = df.select(
            text.fingerprint("t1").alias("f1"), text.fingerprint("t2").alias("f2")
        ).collect()
        assert rows[0].f1 == rows[0].f2
        assert rows[1].f1 != rows[1].f2

    def test_pii_report_per_group(self, spark):
        df = spark.createDataFrame(
            [
                ("a", "mail me at x@y.com or z@w.org"),
                ("a", "clean text"),
                ("b", "server at 10.0.0.1"),
            ],
            "src string, t string",
        )
        rows = {
            r.src: (r.n_docs, r.docs_affected, r.email_n, r.ipv4_n, r.phone_n)
            for r in text.pii_report(df, "t", "src").collect()
        }
        assert rows == {"a": (2, 1, 2, 0, 0), "b": (1, 1, 0, 1, 0)}

    def test_canonical_url_rules(self, spark):
        cases = [
            # scheme/host lowered, www + default port stripped, fragment
            # dropped, trailing slash dropped, params filtered + sorted
            (
                "HTTPS://WWW.Ex.COM:443/Path/?utm_source=x&b=2&a=1#f",
                "https://ex.com/Path?a=1&b=2",
            ),
            ("HTTP://Host.ORG:80/q/deep?z=1&referrer=keep#t",
             "http://host.org/q/deep?referrer=keep&z=1"),
            # 'ref' drops exact key only; path case preserved
            ("https://a.com/A?ref=x&Ref=keepcase", "https://a.com/A?Ref=keepcase"),
            # all params dropped -> no '?'; non-default port kept
            ("https://a.com:8443/?utm_a=1&gclid=2", "https://a.com:8443"),
            # schemeless input: host rules still apply
            ("WWW.Ex.com/p", "ex.com/p"),
            # :443 is only default for https
            ("http://a.com:443/x", "http://a.com:443/x"),
            # control chars: tab/newline padding stripped, fragment
            # containing a newline fully dropped
            ("\thttp://A.com/x \n", "http://a.com/x"),
            ("http://a.com/p#f\nleftover", "http://a.com/p"),
            ("http://a.com/p?a=1#f\nx\ny", "http://a.com/p?a=1"),
            ("", ""),
            (None, None),
        ]
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(cases)], "i long, u string"
        )
        got = {
            r.i: r.c
            for r in df.select(
                "i", text.canonical_url("u").alias("c")
            ).collect()
        }
        for i, (u, want) in enumerate(cases):
            assert got[i] == want, (u, got[i], want)

    def test_canonical_url_keep_www_and_custom_params(self, spark):
        df = spark.createDataFrame(
            [("https://www.a.com/p?sid=1&x=2",)], "u string"
        )
        keep = df.select(
            text.canonical_url(
                "u", strip_www=False, drop_params=("sid",)
            ).alias("c")
        ).collect()[0].c
        assert keep == "https://www.a.com/p?x=2"

    def test_canonical_url_randomized_differential(self, spark):
        # independent pure-python reference over a generated URL space —
        # pins the first-'#'/first-'?' split points, greedy host match,
        # prefix-vs-exact param dropping, and bytewise param sort
        import random

        def ref(u):
            u = u.strip()
            u = u.split("#", 1)[0]
            base, _, query = u.partition("?")
            scheme = ""
            if "://" in base:
                cand, rest = base.split("://", 1)
                ok = cand and cand[0].isalpha() and all(
                    c.isalnum() or c in "+.-" for c in cand
                )
                if ok:
                    scheme, base = cand.lower() + "://", rest
            host, slash, path = base.partition("/")
            host = host.lower()
            path = slash + path
            if path.endswith("/"):
                path = path[:-1]
            if host.startswith("www."):
                host = host[4:]
            if scheme == "http://" and host.endswith(":80"):
                host = host[:-3]
            if scheme == "https://" and host.endswith(":443"):
                host = host[:-4]
            keep = []
            for p in query.split("&"):
                if not p:
                    continue
                key = p.split("=", 1)[0]
                if key.startswith("utm_") or key in ("fbclid", "gclid", "ref"):
                    continue
                keep.append(p)
            qs = "&".join(sorted(keep))
            return scheme + host + path + ("?" + qs if qs else "")

        rng = random.Random(77)
        schemes = ["", "http://", "HTTPS://", "HtTp://", "ftp://"]
        hosts = ["WWW.Ex.COM", "a.b.org", "www.x.net:80", "Y.com:443",
                 "z.io:8080", "host"]
        paths = ["", "/", "/P/q", "/deep/Path/", "/x"]
        params = ["a=1", "B=2", "utm_source=s", "utm_x=9", "ref=r",
                  "refx=keep", "fbclid=f", "z=Last", "", "k"]
        frags = ["", "#f", "#a?b=1", "#f\nres\tidue", "\n", " \t"]
        urls = []
        for _ in range(300):
            q = "&".join(rng.sample(params, rng.randrange(0, 5)))
            urls.append(
                rng.choice(schemes) + rng.choice(hosts) + rng.choice(paths)
                + ("?" + q if q else "") + rng.choice(frags)
            )
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(urls)], "i long, u string"
        )
        got = {
            r.i: r.c
            for r in df.select("i", text.canonical_url("u").alias("c")).collect()
        }
        for i, u in enumerate(urls):
            assert got[i] == ref(u), (u, got[i], ref(u))


class TestDecontaminate:
    def test_known_overlap(self, spark):
        train = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated text with no overlap at all here"),
                (3, "quick brown fox jumps again and again and again"),
            ],
            "doc_id bigint, text string",
        )
        bench = spark.createDataFrame(
            [(100, "a quick brown fox jumps into the benchmark")],
            "doc_id bigint, text string",
        )
        hits = {
            r.doc_id: r.contaminated_ngrams
            for r in text.decontaminate(
                train, "doc_id", "text", bench, n=3
            ).collect()
        }
        # doc 1 shares 'quick brown fox' + 'brown fox jumps'; doc 3 the same 2
        assert hits == {1: 2, 3: 2}
        clean = text.decontaminate_filter(train, "doc_id", "text", bench, n=3)
        assert sorted(r.doc_id for r in clean.collect()) == [2]

    def test_matches_python_ground_truth(self, documents):
        bench = documents.filter(F.col("doc_id") % 20 == 0)
        train = documents.filter(F.col("doc_id") % 20 != 0)
        got = {
            r.doc_id: r.contaminated_ngrams
            for r in text.decontaminate(train, "doc_id", "text", bench, n=4).collect()
        }

        def grams(t, n=4):
            toks = t.split()
            if len(toks) <= n:
                return {" ".join(toks[:n])}
            return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

        rows = documents.select("doc_id", "text").collect()
        bench_g = set()
        for r in rows:
            if r.doc_id % 20 == 0:
                bench_g |= grams(r.text)
        want = {}
        for r in rows:
            if r.doc_id % 20 != 0:
                k = len(grams(r.text) & bench_g)
                if k:
                    want[r.doc_id] = k
        assert got == want

    def test_benchmark_side_is_broadcast(self, documents):
        from datafusion_functions_json_spark.plans import explain_str

        bench = documents.filter(F.col("doc_id") % 20 == 0)
        plan = explain_str(
            text.decontaminate(documents, "doc_id", "text", bench, n=4)
        )
        assert "BroadcastHashJoin" in plan


class TestExactDedup:
    def test_dup_groups_on_documents(self, documents):
        dups = dedup.exact_dup_groups(documents, "text", "doc_id")
        total = documents.count()
        deduped = dedup.exact_dedup(documents, "text").count()
        dup_rows = dups.agg(
            F.coalesce(F.sum(F.col("dup_count") - 1), F.lit(0))
        ).collect()[0][0]
        assert deduped == total - dup_rows

    def test_dup_groups_max_ids_caps_list_not_count(self, spark):
        # the mega-dup-key guard: dup_count stays EXACT while ids holds
        # only the max_ids smallest ids (collect_list arrays don't
        # spill; the ranking window does)
        rows = [(i, "same") for i in range(100)] + [(200, "other"), (201, "other")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for hk in (False, True):
            out = {
                r.text: r
                for r in dedup.exact_dup_groups(
                    df, "text", "doc_id", hash_key=hk, max_ids=5
                ).collect()
            }
            assert out["same"].dup_count == 100
            assert out["same"].ids == [0, 1, 2, 3, 4]
            assert out["other"].dup_count == 2
            assert out["other"].ids == [200, 201]
        with pytest.raises(ValueError, match="max_ids"):
            dedup.exact_dup_groups(df, "text", "doc_id", max_ids=0)

    def test_dup_groups_max_ids_null_ids_dont_eat_slots(self, spark):
        # NULL ids sort LAST in the ranking window: collect_list drops
        # them anyway, so a NULL ranked first would consume a max_ids
        # slot and shrink the list below max_ids even when enough
        # non-null ids exist (round-11 ADVICE)
        rows = [(None, "same"), (None, "same")] + [
            (i, "same") for i in range(10)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for hk in (False, True):
            (row,) = dedup.exact_dup_groups(
                df, "text", "doc_id", hash_key=hk, max_ids=3
            ).collect()
            assert row.dup_count == 12  # NULL rows still counted
            assert row.ids == [0, 1, 2]  # 3 smallest NON-NULL ids

    def test_dup_groups_max_ids_single_exchange(self, spark):
        # the ranking window must REUSE the aggregation's key
        # partitioning — one shuffle total
        from datafusion_functions_json_spark.plans import explain_str

        df = spark.createDataFrame(
            [(i, f"t{i % 3}") for i in range(30)], "doc_id long, text string"
        )
        plan = explain_str(
            dedup.exact_dup_groups(df, "text", "doc_id", max_ids=3)
        )
        import re as _re

        n_exchange = len(_re.findall(r"\bExchange\b", plan))
        assert n_exchange == 1, plan


class TestMinhash:
    def test_exact_dup_texts_always_pair(self, spark):
        rows = [(1, "the quick brown fox jumps over the lazy dog repeatedly"),
                (2, "the quick brown fox jumps over the lazy dog repeatedly"),
                (3, "completely different text about spark query engines here"),
                (4, "")]
        df = spark.createDataFrame(rows, "id long, text string")
        pairs = dedup.minhash_dup_pairs(df, "id", "text", num_perm=32, bands=8).collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
        assert pairs[0].jaccard == 1.0

    def test_bucketed_band_table_matches_unbucketed_and_skips_exchange(
        self, spark, documents
    ):
        mh = dict(num_perm=32, bands=8, mode="word", n=3)
        fam = dict(num_perm=32, seed=42, mode="word", n=3)
        idx_docs = documents.filter(F.col("doc_id") % 5 != 0).select(
            "doc_id", "text"
        )
        index = dedup.minhash_index(idx_docs, "doc_id", "text", **fam)
        dedup.minhash_band_table(
            index, "mh_bands_t", num_buckets=4, **mh
        )
        try:
            bt = spark.table("mh_bands_t")
            batch = idx_docs.filter(F.col("doc_id") < 40).select(
                (F.col("doc_id") + 9000).alias("doc_id"), "text"
            )
            got = dedup.minhash_dup_pairs_against_bucketed(
                batch, bt, index, "doc_id", "text", threshold=0.8, **mh
            )
            want = dedup.minhash_dup_pairs_against(
                batch, index, "doc_id", "text", threshold=0.8, **mh
            )
            g = {(r.new_id, r.index_id, round(r.jaccard, 9)) for r in got.collect()}
            w = {(r.new_id, r.index_id, round(r.jaccard, 9)) for r in want.collect()}
            assert g == w and g  # identical verified pairs, non-empty
            # the 100 TB contract: the candidate join's INDEX side comes
            # pre-shuffled from the bucket layout — only the batch side
            # exchanges (an unbucketed self-built band frame needs two)
            rows = 32 // 8
            nb = (
                dedup.minhash_index(batch, "doc_id", "text", **fam)
                .withColumn(
                    "_band",
                    F.explode(
                        dedup.lsh_bands(F.col("sig"), bands=8, rows=rows)
                    ),
                )
                .select(
                    F.col("_band.band_id").alias("band_id"),
                    F.col("_band.band_hash").alias("band_hash"),
                    F.col("id").alias("new_id"),
                )
            )
            # force a shuffle join (a tiny test batch would broadcast,
            # hiding the property): the bucketed side still must not
            # exchange, so exactly ONE hash exchange remains
            thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                bucketed_plan = (
                    nb.join(bt, ["band_id", "band_hash"])
                    ._jdf.queryExecution()
                    .executedPlan()
                    .toString()
                )
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
            assert bucketed_plan.count("Exchange hashpartitioning") == 1
            # family mismatch refuses instead of silently missing dups
            with pytest.raises(ValueError, match="band table"):
                dedup.minhash_dup_pairs_against_bucketed(
                    batch, bt, index, "doc_id", "text",
                    num_perm=32, bands=4, mode="word", n=3,
                )
            # a grown index refuses too (its new docs would silently
            # miss the band join); explicit opt-out allowed
            grown = index.unionByName(
                dedup.minhash_index(
                    documents.filter(F.col("doc_id") % 5 == 0).select(
                        "doc_id", "text"
                    ),
                    "doc_id",
                    "text",
                    **fam,
                )
            )
            with pytest.raises(ValueError, match="rebuild the band table"):
                dedup.minhash_dup_pairs_against_bucketed(
                    grown, bt, grown, "doc_id", "text", threshold=0.8, **mh
                )
            dedup.minhash_dup_pairs_against_bucketed(
                batch, bt, grown, "doc_id", "text",
                threshold=0.8, check_sync=False, **mh,
            ).collect()
            # in-place replacement at EQUAL cardinality: the default
            # count probe is blind to it (documented), but
            # check_sync="full" compares the recorded content checksum
            # and refuses
            replaced = dedup.minhash_index(
                idx_docs.withColumn(
                    "text",
                    F.when(
                        F.col("doc_id") == idx_docs.limit(1).collect()[0][0],
                        F.lit(
                            "mutated replacement text about nothing in "
                            "particular whatsoever at all"
                        ),
                    ).otherwise(F.col("text")),
                ),
                "doc_id",
                "text",
                **fam,
            )
            assert replaced.count() == index.count()
            dedup.minhash_dup_pairs_against_bucketed(
                batch, bt, replaced, "doc_id", "text", threshold=0.8, **mh
            ).collect()  # default probe: blind spot, passes
            with pytest.raises(ValueError, match="content checksum"):
                dedup.minhash_dup_pairs_against_bucketed(
                    batch, bt, replaced, "doc_id", "text",
                    threshold=0.8, check_sync="full", **mh,
                )
            # "full" against the pristine index still passes
            dedup.minhash_dup_pairs_against_bucketed(
                batch, bt, index, "doc_id", "text",
                threshold=0.8, check_sync="full", **mh,
            ).collect()
            # a table built WITHOUT a checksum must refuse "full"
            # loudly — silently degrading to the count probe would
            # reopen the blind spot "full" exists to close
            dedup.minhash_band_table(
                index, "mh_bands_nock", num_buckets=4,
                record_checksum=False, **mh,
            )
            try:
                bt2 = spark.table("mh_bands_nock")
                with pytest.raises(ValueError, match="no content checksum"):
                    dedup.minhash_dup_pairs_against_bucketed(
                        batch, bt2, index, "doc_id", "text",
                        threshold=0.8, check_sync="full", **mh,
                    )
                # default count probe still works on that table
                dedup.minhash_dup_pairs_against_bucketed(
                    batch, bt2, index, "doc_id", "text",
                    threshold=0.8, **mh,
                ).collect()
            finally:
                spark.sql("drop table if exists mh_bands_nock")
        finally:
            spark.sql("drop table if exists mh_bands_t")

    def test_from_index_matches_direct_and_rejects_family(self, spark):
        rows = [(1, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
                (2, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
                (3, "totally different text about catalyst plans here"),
                (4, "totally different text about catalyst plans here")]
        df = spark.createDataFrame(rows, "id long, text string")
        fam = dict(num_perm=32, seed=42, mode="word", n=3)
        direct = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.minhash_dup_pairs(
                df, "id", "text", bands=8, threshold=0.8, **fam
            ).collect()
        }
        idx = dedup.minhash_index(df, "id", "text", **fam).persist()
        try:
            self._from_index_body(spark, idx, fam, direct)
        finally:
            idx.unpersist()

    def _from_index_body(self, spark, idx, fam, direct):
        via_index = {
            (r.id_a, r.id_b, r.jaccard)
            for r in dedup.minhash_dup_pairs_from_index(
                idx, bands=8, threshold=0.8, **fam
            ).collect()
        }
        assert via_index == direct and len(direct) == 2
        # a mismatched permutation family must refuse, not silently
        # compare incomparable signatures (zero recall otherwise)
        with pytest.raises(ValueError, match="family|num_perm|index"):
            dedup.minhash_dup_pairs_from_index(idx, num_perm=64, bands=8)
        # the precomputed-batch arm of the incremental join: identical
        # pairs to the compute-it-yourself path, and the same family
        # rejection for the new_index
        other = spark.createDataFrame(
            [(10, "aaaa bbbb cccc dddd eeee ffff gggg hhhh")],
            "id long, text string",
        )
        want = {
            (r.new_id, r.index_id)
            for r in dedup.minhash_dup_pairs_against(
                other, idx, "id", "text", bands=8, threshold=0.8, **fam
            ).collect()
        }
        oidx = dedup.minhash_index(other, "id", "text", **fam)
        got = {
            (r.new_id, r.index_id)
            for r in dedup.minhash_dup_pairs_against(
                None, idx, "id", "text",
                bands=8, threshold=0.8, new_index=oidx, **fam,
            ).collect()
        }
        assert got == want and got == {(10, 1), (10, 2)}
        bad = dedup.minhash_index(other, "id", "text", num_perm=16,
                                  seed=42, mode="word", n=3)
        with pytest.raises(ValueError, match="family|num_perm|index"):
            dedup.minhash_dup_pairs_against(
                None, idx, "id", "text",
                bands=8, threshold=0.8, new_index=bad, **fam,
            )

    def test_minhash_dedup_invalid_bands_leaves_no_cache(self, spark):
        # review finding: persisting before parameter validation left a
        # dead CacheManager entry behind the ValueError
        df = spark.createDataFrame(
            [(1, "some text here for the table")], "id long, text string"
        )
        jsc = spark.sparkContext._jsc.sc()
        spark.catalog.clearCache()
        before = jsc.getPersistentRDDs().size()
        with pytest.raises(ValueError):
            dedup.minhash_dup_pairs(df, "id", "text", num_perm=64, bands=10)
        assert jsc.getPersistentRDDs().size() <= before

    def test_minhash_dedup_removes_losers(self, spark):
        rows = [(1, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
                (2, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
                (3, "unrelated content entirely")]
        df = spark.createDataFrame(rows, "id long, text string")
        kept = dedup.minhash_dedup(df, "id", "text", num_perm=32, bands=8)
        assert sorted(r.id for r in kept.collect()) == [1, 3]

    def test_minhash_dedup_components_method(self, spark):
        rows = [(1, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
                (2, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
                (3, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
                (4, "unrelated content entirely")]
        df = spark.createDataFrame(rows, "id long, text string")
        kept = dedup.minhash_dedup(
            df, "id", "text", num_perm=32, bands=8, method="components"
        )
        assert sorted(r.id for r in kept.collect()) == [1, 4]
        with pytest.raises(ValueError):
            dedup.minhash_dedup(df, "id", "text", method="nope")

    def test_minhash_dedup_keep_best_method(self, spark):
        rows = [(1, "aaaa bbbb cccc dddd eeee ffff gggg hhhh", 0.2),
                (2, "aaaa bbbb cccc dddd eeee ffff gggg hhhh", 0.9),
                (3, "aaaa bbbb cccc dddd eeee ffff gggg hhhh", 0.5),
                (4, "unrelated content entirely", 0.1)]
        df = spark.createDataFrame(rows, "id long, text string, q double")
        kept = dedup.minhash_dedup(
            df, "id", "text",
            num_perm=32, bands=8, method="keep_best", score_col="q",
        )
        assert sorted(r.id for r in kept.collect()) == [2, 4]
        with pytest.raises(ValueError, match="score_col"):
            dedup.minhash_dedup(df, "id", "text", method="keep_best")

    def test_documents_near_dups_verified(self, documents):
        pairs = dedup.minhash_dup_pairs(
            documents, "doc_id", "text", num_perm=32, bands=8, threshold=0.8
        )
        for p in pairs.take(5):
            assert p.jaccard >= 0.8


class TestSimhash:
    def test_simhash_stable_and_distinct(self, spark):
        df = spark.createDataFrame(
            [("spark json engine test document",),
             ("spark json engine test document",),
             ("an entirely different sentence structure",)],
            "t string",
        )
        vals = [r.s for r in df.select(dedup.simhash("t").alias("s")).collect()]
        assert vals[0] == vals[1] != vals[2]

    def test_simhash_pairs_blocked_join(self, spark):
        rows = [(1, "alpha beta gamma delta epsilon zeta"),
                (2, "alpha beta gamma delta epsilon zeta"),
                (3, "one two three four five six seven eight")]
        df = spark.createDataFrame(rows, "id long, text string")
        pairs = dedup.simhash_dup_pairs(df, "id", "text", max_hamming=3).collect()
        assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]

    def test_block_cap_prunes_hot_blocks_keeps_close_pairs(self, spark):
        # 30 docs sharing ONE word ("common") pool into hot blocks;
        # an exact-dup pair (hamming 0, agrees on all 4 blocks)
        # survives any cap because not every block it agrees on is hot.
        rows = [
            (i, f"common word{i} tail{i} extra{i} filler{i}")
            for i in range(1, 31)
        ] + [
            (100, "alpha beta gamma delta epsilon zeta"),
            (101, "alpha beta gamma delta epsilon zeta"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        capped = dedup.simhash_dup_pairs(df, "id", "text", block_cap=5)
        got = [(p.id_a, p.id_b, p.hamming) for p in capped.collect()]
        assert (100, 101, 0) in got
        # and the cap is a strict subset of the uncapped pair set
        full = {
            (p.id_a, p.id_b)
            for p in dedup.simhash_dup_pairs(df, "id", "text").collect()
        }
        assert {(a, b) for a, b, _ in got} <= full

    def test_block_cap_validation(self, spark):
        df = spark.createDataFrame([(1, "a b c")], "id long, text string")
        with pytest.raises(ValueError, match="block_cap"):
            dedup.simhash_dup_pairs(df, "id", "text", block_cap=1)

    def test_null_text_does_not_pool_into_one_bucket(self, spark):
        # Spark struct equality treats NULL fields as EQUAL, so without
        # the _sh null filter N null-text docs produce an N^2/2 block
        # join (invisible in the RESULT — hamming on null filters every
        # row — visible only as shuffle cost). Pin both the result and
        # the candidate volume.
        rows = [(i, None) for i in range(1, 40)] + [
            (100, "alpha beta gamma delta epsilon zeta"),
            (101, "alpha beta gamma delta epsilon zeta"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        pairs = dedup.simhash_dup_pairs(df, "id", "text").collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(100, 101)]
        stats = dedup.simhash_candidate_stats(df, "id", "text")
        # 4 blocks x the one true pair; zero contribution from nulls
        assert stats["join_rows"] == 4
        assert stats["distinct_pairs"] == 1
        assert stats["max_bucket"] == 2


class TestCandidateStats:
    """band_candidate_stats: the pre-verification join volume — the
    quantity that blows up under loose banding at high dup density
    (VERDICT r16 #2); planted-density measurements in BASELINE.md."""

    def test_join_rows_and_skew(self, spark):
        # bucket A holds 3 ids -> C(3,2)=3 join rows; bucket B holds 2
        # -> 1; singleton C contributes nothing
        keyed = spark.createDataFrame(
            [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "C")],
            "id long, key string",
        )
        s = dedup.band_candidate_stats(keyed)
        assert s == {
            "join_rows": 3 + 1,
            "max_bucket": 3,
            "buckets_multi": 2,
            "distinct_pairs": 4,
        }

    def test_multiband_pair_counted_once_in_distinct(self, spark):
        # the same pair agreeing on 2 bands costs 2 join rows but 1
        # distinct candidate
        keyed = spark.createDataFrame(
            [(1, "b0"), (2, "b0"), (1, "b1"), (2, "b1")],
            "id long, key string",
        )
        s = dedup.band_candidate_stats(keyed)
        assert s["join_rows"] == 2
        assert s["distinct_pairs"] == 1

    def test_empty_input_is_all_zero(self, spark):
        keyed = spark.createDataFrame([], "id long, key string")
        s = dedup.band_candidate_stats(keyed)
        assert s == {
            "join_rows": 0,
            "max_bucket": 0,
            "buckets_multi": 0,
            "distinct_pairs": 0,
        }

    def test_minhash_stats_match_pair_output(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different text about spark query engines"),
            (4, "another unrelated document mentioning nothing shared"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        idx = dedup.minhash_index(
            df, "id", "text", num_perm=32, mode="word", n=3
        )
        s = dedup.minhash_candidate_stats(idx, num_perm=32, bands=8)
        # identical docs agree on all 8 bands; nothing else collides
        assert s["join_rows"] == 8
        assert s["distinct_pairs"] == 1
        assert s["max_bucket"] == 2
        pairs = dedup.minhash_dup_pairs(
            df, "id", "text", num_perm=32, bands=8, mode="word", n=3
        ).collect()
        assert len(pairs) == s["distinct_pairs"]


class TestNgramJaccard:
    def test_pairs(self, spark):
        rows = [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "totally different words here now")]
        df = spark.createDataFrame(rows, "id long, text string")
        pairs = dedup.ngram_jaccard_pairs(df, "id", "text", n=2, threshold=0.9).collect()
        assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def _uf_components(edges):
    """Brute-force union-find oracle: {node: min-id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


class TestConnectedComponents:
    def _run(self, spark, edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.comp
            for r in graph.connected_components(df, "src", "dst").collect()
        }
        assert got == _uf_components(edges)

    def test_chain_merges_transitively(self, spark):
        # a pure chain: one-shot pair removal would keep 1..5 distinct
        self._run(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])

    def test_reversed_dup_and_self_edges(self, spark):
        self._run(spark, [(2, 1), (1, 2), (3, 3), (3, 2), (7, 9), (9, 7)])

    def test_random_graph_matches_union_find(self, spark):
        import random

        rng = random.Random(7)
        edges = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(90)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        self._run(spark, edges)

    def test_empty(self, spark):
        df = spark.createDataFrame([], "src long, dst long")
        assert graph.connected_components(df).count() == 0

    def test_string_vertex_ids(self, spark):
        # min-id representative works for any orderable type
        df = spark.createDataFrame(
            [("b", "c"), ("a", "b"), ("x", "y")], "src string, dst string"
        )
        got = {
            r.node: r.comp
            for r in graph.connected_components(df).collect()
        }
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_larger_random_graphs_multiple_seeds(self, spark):
        import random

        for seed in (1, 23):
            rng = random.Random(seed)
            edges = [
                (rng.randrange(200), rng.randrange(200)) for _ in range(300)
            ]
            edges = [(a, b) for a, b in edges if a != b]
            self._run(spark, edges)

    def test_dedup_by_components_keeps_min_per_component(self, spark):
        df = spark.createDataFrame(
            [(i, f"doc{i}") for i in range(6)], "id long, text string"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
        )
        kept = sorted(
            r.id for r in graph.dedup_by_components(df, "id", pairs).collect()
        )
        assert kept == [0, 1, 4]

    def test_dedup_keep_best_picks_highest_score(self, spark):
        # component {1,2,3}: best score at id 3; component {4,5}: tie →
        # min id 4; id 0 untouched (never in pairs)
        df = spark.createDataFrame(
            [(0, 1.0), (1, 5.0), (2, 9.0), (3, 9.5), (4, 2.0), (5, 2.0)],
            "id long, score double",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
        )
        kept = sorted(
            r.id
            for r in graph.dedup_keep_best(df, "id", pairs, "score").collect()
        )
        assert kept == [0, 3, 4]

    def test_dedup_keep_best_null_and_missing_scores_lose(self, spark):
        # id 7 has NULL score, id 9 is in the pair graph but absent from
        # df — both must lose to the scored id 8; absent ids never
        # resurrect.
        df = spark.createDataFrame(
            [(7, None), (8, 0.5)], "id long, score double"
        )
        pairs = spark.createDataFrame(
            [(7, 8), (8, 9)], "id_a long, id_b long"
        )
        kept = sorted(
            r.id
            for r in graph.dedup_keep_best(df, "id", pairs, "score").collect()
        )
        assert kept == [8]

    def test_dup_provenance_min_id_and_scored(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (2, 9.0), (3, 2.0), (4, 2.0), (5, 1.0)],
            "id long, score double",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
        )
        # min-id policy: comp reps are 1 and 4
        plain = {
            (r.dropped_id, r.kept_id)
            for r in graph.dup_provenance(df, "id", pairs).collect()
        }
        assert plain == {(2, 1), (3, 1), (5, 4)}
        # scored policy mirrors dedup_keep_best: reps are 2 and 4 (tie)
        scored = {
            (r.dropped_id, r.kept_id)
            for r in graph.dup_provenance(df, "id", pairs, "score").collect()
        }
        assert scored == {(1, 2), (3, 2), (5, 4)}
        # composes exactly with dedup_keep_best's survivors
        kept = {
            r.id for r in graph.dedup_keep_best(df, "id", pairs, "score").collect()
        }
        assert {k for _, k in scored} <= kept
        assert kept.isdisjoint({d for d, _ in scored})


class TestSplit:
    def test_fraction_matches_hashlib(self, spark):
        import hashlib

        expected = int(hashlib.md5(b"s:42").hexdigest()[:8], 16) / 2**32
        got = (
            spark.range(42, 43)
            .select(split.split_fraction("id", "s").alias("f"))
            .collect()[0]
            .f
        )
        assert abs(got - expected) < 1e-12

    def test_hash_split_proportions_and_determinism(self, spark):
        df = spark.range(4000)
        lab = split.hash_split(
            df, "id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="r2"
        )
        counts = {r.split: r.n for r in lab.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert 0.85 < counts["train"] / 4000 < 0.95
        again = split.hash_split(
            df, "id", {"train": 0.9, "val": 0.05, "test": 0.05}, salt="r2"
        )
        assert lab.exceptAll(again).count() == 0

    def test_hash_split_bad_fractions(self, spark):
        with pytest.raises(ValueError):
            split.hash_split(spark.range(2), "id", {"a": 0.5, "b": 0.1})

    def test_mixture_sample_rates_and_determinism(self, spark):
        rows = [(i, "web" if i % 2 else "code") for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, source string")
        mix = split.mixture_sample(
            df, "id", "source", {"web": 0.5, "code": 1.0}, salt="m"
        )
        counts = {
            r.source: r.n
            for r in mix.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts["code"] == 1000  # rate 1.0 keeps everything
        assert 400 < counts["web"] < 600
        again = split.mixture_sample(
            df, "id", "source", {"web": 0.5, "code": 1.0}, salt="m"
        )
        assert mix.exceptAll(again).count() == 0
        # unlisted source drops by default
        other = spark.createDataFrame([(1, "junk")], "id long, source string")
        assert split.mixture_sample(
            other, "id", "source", {"web": 0.5}
        ).count() == 0
        with pytest.raises(ValueError):
            split.mixture_sample(df, "id", "source", {})

    def test_mixture_resample_upsamples(self, spark):
        rows = [(i, "rare" if i % 2 else "common") for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, source string")
        mix = split.mixture_resample(
            df, "id", "source", {"rare": 2.5, "common": 1.0}, salt="u"
        )
        counts = {
            r.source: r.n
            for r in mix.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts["common"] == 500  # rate 1.0: exactly one copy each
        assert 1150 < counts["rare"] < 1350  # 500 * 2.5 = 1250 expected
        # copy indices are 1..k per id
        copies = [
            r.copy
            for r in mix.filter(F.col("source") == "rare")
            .filter(F.col("id") == 1)
            .collect()
        ]
        assert sorted(copies) == list(range(1, len(copies) + 1))
        assert len(copies) in (2, 3)
        # determinism
        again = split.mixture_resample(
            df, "id", "source", {"rare": 2.5, "common": 1.0}, salt="u"
        )
        assert mix.exceptAll(again).count() == 0

    def test_pack_batches_prefix_sum_assignment(self, spark):
        df = spark.createDataFrame(
            [(i, 40) for i in range(10)], "id long, nt int"
        )
        out = split.pack_batches(
            df, "id", "nt", budget=100, shards=1,
            shard_expr=F.lit(0),
        ).collect()
        got = {r.id: r.batch_id for r in out}
        # prefix before id i = 40*i; batch = floor(40*i/100)
        assert got == {i: (40 * i) // 100 for i in range(10)}
        with pytest.raises(ValueError):
            split.pack_batches(df, "id", "nt", budget=0)

    def test_pack_batches_sharded_parallel(self, spark):
        df = spark.createDataFrame(
            [(i, 10 + i % 3) for i in range(60)], "id long, nt int"
        )
        out = split.pack_batches(df, "id", "nt", budget=50, shards=4)
        assert out.count() == 60
        # every (shard, batch) holds >= 1 row; shards bounded
        assert out.select("shard").distinct().count() <= 4

    def test_stratified_sample_exact_counts(self, spark):
        rows = [(i, "web" if i % 2 else "code") for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, source string")
        got = split.stratified_sample(df, "id", "source", 25, salt="s")
        counts = {
            r.source: r.n
            for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"web": 25, "code": 25}
        # deterministic: selection is a pure function of (id, salt)
        again = split.stratified_sample(df, "id", "source", 25, salt="s")
        assert got.exceptAll(again).count() == 0
        # matches the python-side md5 rank ground truth
        import hashlib

        def frac(i):
            return int(hashlib.md5(f"s:{i}".encode()).hexdigest()[:8], 16)

        web_ids = sorted((i for i in range(1000) if i % 2), key=lambda i: (frac(i), i))[:25]
        got_web = sorted(r.id for r in got.filter(F.col("source") == "web").collect())
        assert got_web == sorted(web_ids)

    def test_stratified_sample_dict_budgets_and_prefilter(self, spark):
        rows = [(i, "web" if i % 2 else "code") for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, source string")
        got = split.stratified_sample(
            df, "id", "source", {"web": 10}, salt="s"
        )
        counts = {
            r.source: r.n
            for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"web": 10}  # unlisted stratum dropped
        # a generous prefilter changes nothing (selected fracs ≪ cutoff)
        pre = split.stratified_sample(
            df, "id", "source", {"web": 10}, salt="s", prefilter_fraction=0.5
        )
        assert got.exceptAll(pre).count() == 0 and pre.count() == 10

    def test_cap_per_group_keeps_best_k(self, spark):
        # group a: scores 0..9 → keep ids of the 2 highest (8, 9);
        # group b: all-tied scores → min ids win; NULL score loses
        rows = [(i, "a", float(i)) for i in range(10)]
        rows += [(100 + i, "b", 1.0) for i in range(3)]
        rows.append((200, "b", None))
        df = spark.createDataFrame(rows, "id long, g string, s double")
        got = split.cap_per_group(df, "g", "s", "id", 2)
        by_g = {}
        for r in got.collect():
            by_g.setdefault(r.g, []).append(r.id)
        assert sorted(by_g["a"]) == [8, 9]
        assert sorted(by_g["b"]) == [100, 101]
        # ascending preference flips group a; small groups survive whole
        asc = split.cap_per_group(df, "g", "s", "id", 2, descending=False)
        assert sorted(
            r.id for r in asc.filter(F.col("g") == "a").collect()
        ) == [0, 1]
        assert split.cap_per_group(df, "g", "s", "id", 50).count() == len(rows)
        with pytest.raises(ValueError):
            split.cap_per_group(df, "g", "s", "id", 0)

    def test_cap_per_group_plans_window_group_limit(self, spark):
        # the 100 TB contract: rank<=k must plan WindowGroupLimit (map-
        # side running top-k per group), not a full per-group sort
        df = spark.createDataFrame(
            [(i, "g", float(i)) for i in range(10)], "id long, g string, s double"
        )
        plan = (
            split.cap_per_group(df, "g", "s", "id", 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan


class TestQuantize:
    def test_l2_normalize_unit_norm_and_zero_guard(self, spark):
        df = spark.createDataFrame(
            [([3.0, 4.0],), ([0.0, 0.0],)], "v array<double>"
        )
        rows = df.select(
            similarity.l2_normalize("v").alias("n")
        ).collect()
        assert rows[0].n == [0.6, 0.8]
        assert rows[1].n == [0.0, 0.0]

    def test_quantize_roundtrip_and_saturation(self, spark):
        df = spark.createDataFrame([([0.5, -1.0, 2.0, -2.0],)], "v array<double>")
        q = df.select(similarity.quantize_int8("v").alias("q")).collect()[0].q
        # floor(0.5*127+0.5)=64; -1 -> floor(-126.5)=-127; +-2 saturate
        assert q == [64, -127, 127, -127]
        d = df.select(
            similarity.dequantize_int8(similarity.quantize_int8("v")).alias("d")
        ).collect()[0].d
        assert abs(d[0] - 0.5) < 1 / 127 and d[2] == 1.0


class TestSimilarity:
    def test_cosine_topk_auto_tier_policy(self, embeddings, monkeypatch):
        # round-15 crossover (BASELINE.md): numpy's lower fixed cost
        # wins under ~200k rows (~64 MB of 64-dim floats), the JVM HOF
        # twin's ~2.7x-cheaper per-row cost wins above; unknown size
        # reads LARGE (hof is never catastrophically wrong small, the
        # reverse is). Assert through the PHYSICAL plan: the vectorized
        # tier has an ArrowEvalPython node, the hof tier has none.
        from datafusion_functions_json_spark.plans import arrow_eval_count

        q = [0.1] * 64
        # small plan-stat -> vectorized (one Arrow hop)
        monkeypatch.setattr(similarity, "_plan_size_bytes", lambda df: 1024)
        assert arrow_eval_count(
            similarity.cosine_topk(embeddings, "embedding", q, k=3)
        ) == 1
        # large -> hof (pure JVM); unknown -> hof as well
        for stat in ((64 << 20) + 1, None):
            monkeypatch.setattr(
                similarity, "_plan_size_bytes", lambda df, _s=stat: _s
            )
            assert arrow_eval_count(
                similarity.cosine_topk(embeddings, "embedding", q, k=3)
            ) == 0
        # the real stat of a file-backed frame is a positive size
        monkeypatch.undo()
        sz = similarity._plan_size_bytes(embeddings)
        assert isinstance(sz, int) and sz > 0

    def test_cosine_topk_self_query(self, embeddings):
        # querying with row 0's own embedding must return row 0 first
        q = embeddings.filter(F.col("vec_id") == 0).first().embedding
        top = similarity.cosine_topk(embeddings, "embedding", q, k=5).collect()
        assert top[0].vec_id == 0
        assert abs(top[0].cosine - 1.0) < 1e-5
        assert all(top[i].cosine >= top[i + 1].cosine for i in range(4))

    def test_cosine_impls_agree(self, embeddings):
        # the numpy tier must reproduce the JVM HOF tier exactly at the
        # rounded precision the operator returns
        q = embeddings.filter(F.col("vec_id") == 3).first().embedding
        vec = similarity.cosine_topk(
            embeddings, "embedding", q, k=10, impl="vectorized"
        ).collect()
        hof = similarity.cosine_topk(
            embeddings, "embedding", q, k=10, impl="hof"
        ).collect()
        assert [(r.vec_id, r.cosine) for r in vec] == [
            (r.vec_id, r.cosine) for r in hof
        ]

    def test_ann_recall_of_exact_top1(self, embeddings):
        q = embeddings.filter(F.col("vec_id") == 7).first().embedding
        ann = similarity.ann_topk(
            embeddings, "embedding", q, k=3, n_planes=8, multiprobe=1
        ).collect()
        assert ann and ann[0].vec_id == 7  # own bucket always contains self

    def test_class_centroids_match_numpy(self, embeddings):
        import numpy as np

        got = {
            r.label: r.centroid
            for r in similarity.class_centroids(
                embeddings, "label", "embedding"
            ).collect()
        }
        rows = embeddings.select("label", "embedding").collect()
        by_label = {}
        for r in rows:
            by_label.setdefault(r.label, []).append(r.embedding)
        for lab, vecs in by_label.items():
            want = np.mean(np.array(vecs, dtype="float64"), axis=0)
            assert len(got[lab]) == 64
            assert np.allclose(got[lab], np.round(want, 6), atol=1e-6)

    def test_centroid_assign_nearest_and_broadcast(self, embeddings):
        import numpy as np

        cent = similarity.class_centroids(embeddings, "label", "embedding")
        assigned = similarity.centroid_assign(
            embeddings, "vec_id", "embedding", cent
        )
        from datafusion_functions_json_spark.plans import explain_str

        # default (numpy) path: scan-shaped — one ArrowEvalPython, no join,
        # no exchange of the N-row side
        plan = explain_str(assigned)
        assert "ArrowEvalPython" in plan
        assert "Join" not in plan
        # the SQL tier keeps the broadcast cross-join + partial-agg argmin
        plan_sql = explain_str(
            similarity.centroid_assign(
                embeddings, "vec_id", "embedding", cent, impl="sql"
            )
        )
        assert (
            "BroadcastNestedLoopJoin" in plan_sql
            or "BroadcastHashJoin" in plan_sql
        )
        # the sql tier is pure JVM: zero Python/Arrow hops in-plan
        assert "EvalPython" not in plan_sql
        got = {r.vec_id: (r.pred_label, r.dist) for r in assigned.collect()}
        # numpy ground truth for a handful of ids
        crows = cent.collect()
        C = np.array([r.centroid for r in crows], dtype="float64")
        labs = [r.label for r in crows]
        rows = embeddings.select("vec_id", "embedding").limit(20).collect()
        for r in rows:
            d2 = ((np.array(r.embedding, dtype="float64") - C) ** 2).sum(axis=1)
            best = min(zip(d2, labs))
            assert got[r.vec_id][0] == best[1]
            assert abs(got[r.vec_id][1] - best[0]) < 1e-9

    def test_kmeans_matches_numpy_lloyd(self, embeddings):
        import hashlib

        import numpy as np

        assigned, cent = similarity.kmeans_fit(
            embeddings, "vec_id", "embedding", k=4, iters=2, salt="t"
        )
        got = {r.vec_id: r.pred_label for r in assigned.collect()}

        rows = embeddings.select("vec_id", "embedding").collect()
        ids = [r.vec_id for r in rows]
        X = np.array([r.embedding for r in rows], dtype="float64")

        def frac(i):
            return int(hashlib.md5(f"t:{i}".encode()).hexdigest()[:8], 16)

        seed_ids = sorted(ids, key=lambda i: (frac(i), i))[:4]
        C = np.array(
            [X[ids.index(i)] for i in seed_ids], dtype="float64"
        )
        labels = list(range(4))
        lab = None
        for it in range(2):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            # argmin picks the first (smallest) label on ties, matching
            # the operator's min(struct(dist, label)) tie-break
            lab = [labels[i] for i in d2.argmin(axis=1)]
            if it < 1:
                present = sorted(set(lab))
                arr = np.array(lab)
                C = np.array(
                    [np.round(X[arr == j].mean(axis=0), 6) for j in present]
                )
                labels = present
        want = dict(zip(ids, (int(x) for x in lab)))
        assert got == want
        assert cent.count() <= 4

    def test_kmeans_rejects_bad_args(self, embeddings):
        with pytest.raises(ValueError):
            similarity.kmeans_fit(embeddings, "vec_id", "embedding", k=0)

    def test_ivf_recall_of_self(self, embeddings):
        assigned, centroids = similarity.ivf_build(
            embeddings, "embedding", dim=64, n_clusters=8, sample=500
        )
        assigned = assigned.cache()
        q = embeddings.filter(F.col("vec_id") == 3).first().embedding
        top = similarity.ivf_topk(
            assigned, centroids, "embedding", q, k=3, nprobe=2
        ).collect()
        assert top and top[0].vec_id == 3  # own cluster is always probed
        # partition-pruning shape: candidates come from <= nprobe clusters
        n_probed = (
            assigned.filter(F.col("ivf_cluster").isin([0, 1, 2, 3, 4, 5, 6, 7]))
            .select("ivf_cluster")
            .distinct()
            .count()
        )
        assert n_probed == 8  # all clusters populated => probe is selective

    def test_centroid_assign_numpy_bit_equals_sql(self, spark):
        # round-12: the numpy assignment (sequential per-dimension fold)
        # must be BIT-identical to the SQL zip_with+aggregate path —
        # same distances, same argmin, same tie-breaks — across random
        # vectors, exact ties (duplicate centroids), label gaps, NULL
        # vectors, and length-mismatched vectors
        import random

        rng = random.Random(11)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(80)
        ]
        rows += [(900, None), (901, [1.0, 2.0])]  # null + wrong length
        df = spark.createDataFrame(rows, "id long, v array<double>")
        cents = [
            (0, [rng.uniform(-1, 1) for _ in range(6)]),
            (2, [rng.uniform(-1, 1) for _ in range(6)]),
            (7, [0.5] * 6),
            (9, [0.5] * 6),  # duplicate of label 7: every near row TIES
        ]
        cent = spark.createDataFrame(cents, "label int, centroid array<double>")
        got_np = {
            r.id: (r.pred_label, r.dist)
            for r in similarity.centroid_assign(
                df, "id", "v", cent, impl="numpy"
            ).collect()
        }
        got_sql = {
            r.id: (r.pred_label, r.dist)
            for r in similarity.centroid_assign(
                df, "id", "v", cent, impl="sql"
            ).collect()
        }
        assert got_np == got_sql  # exact equality, dist bit-for-bit
        # ties resolved toward label 7 (never 9), degenerates -> (0, None)
        assert all(v[0] != 9 for v in got_np.values())
        assert got_np[900] == (0, None) and got_np[901] == (0, None)
        with pytest.raises(ValueError, match="impl"):
            similarity.centroid_assign(df, "id", "v", cent, impl="bogus")

    def test_centroid_assign_auto_tier_selection(self, spark):
        # round-13: impl="auto" (the new default) picks numpy when the
        # per-row SQL cost is non-trivial (k>=2 and k*dim>=32) and the
        # pure-JVM sql formulation below that; both produce identical
        # assignments
        from datafusion_functions_json_spark.plans import explain_str

        df = spark.createDataFrame(
            [(i, [float(i % 5), float(i % 3)]) for i in range(20)],
            "id long, v array<double>",
        )
        tiny = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [4.0, 2.0])],
            "label int, centroid array<double>",
        )
        # k=2, dim=2 -> k*dim=4 < 32: auto stays pure JVM
        auto_small = similarity.centroid_assign(df, "id", "v", tiny)
        assert "EvalPython" not in explain_str(auto_small)
        dim = 32
        df_big = spark.createDataFrame(
            [(i, [float(i)] * dim) for i in range(20)],
            "id long, v array<double>",
        )
        big = spark.createDataFrame(
            [(j, [float(5 * j)] * dim) for j in range(4)],
            "label int, centroid array<double>",
        )
        # k=4, dim=32 -> auto takes the numpy kernel
        auto_big = similarity.centroid_assign(df_big, "id", "v", big)
        assert "ArrowEvalPython" in explain_str(auto_big)
        want = {
            r.id: (r.pred_label, r.dist)
            for r in similarity.centroid_assign(
                df_big, "id", "v", big, impl="sql"
            ).collect()
        }
        got = {r.id: (r.pred_label, r.dist) for r in auto_big.collect()}
        assert got == want

    def test_centroid_assign_degenerate_tables_raise_descriptively(
        self, spark
    ):
        # round-13 ADVICE: the collecting paths (auto/numpy) must raise
        # descriptive errors — not int(None) TypeErrors — on an empty
        # centroid table or NULL centroid labels
        df = spark.createDataFrame([(1, [0.0])], "id long, v array<double>")
        empty = spark.createDataFrame([], "label int, centroid array<double>")
        with pytest.raises(ValueError, match="empty centroid table"):
            similarity.centroid_assign(df, "id", "v", empty)
        nul = spark.createDataFrame(
            [(None, [0.0]), (1, [1.0])], "label int, centroid array<double>"
        )
        with pytest.raises(ValueError, match="NULL label"):
            similarity.centroid_assign(df, "id", "v", nul)
        with pytest.raises(ValueError, match="NULL label"):
            similarity.centroid_assign(df, "id", "v", nul, impl="numpy")
        nulvec = spark.createDataFrame(
            [(0, None), (1, [1.0])], "label int, centroid array<double>"
        )
        with pytest.raises(ValueError, match="NULL centroid vector"):
            similarity.centroid_assign(df, "id", "v", nulvec)
        nulel = spark.createDataFrame(
            [(0, [None, 1.0]), (1, [1.0, 2.0])],
            "label int, centroid array<double>",
        )
        with pytest.raises(ValueError, match="NULL centroid vector"):
            similarity.centroid_assign(df, "id", "v", nulel)
        ragged = spark.createDataFrame(
            [(0, [1.0]), (1, [1.0, 2.0])],
            "label int, centroid array<double>",
        )
        with pytest.raises(ValueError, match="mixed lengths"):
            similarity.centroid_assign(df, "id", "v", ragged)

    def test_centroid_assign_nonfinite_element_envelope(self, spark):
        # round-13: PIN the documented dist-taxonomy envelope so a future
        # numpy change can't silently alter it — vectors with null / NaN
        # / infinite ELEMENTS predict the smallest label on BOTH paths;
        # the numpy path reports dist NULL for all three, where the SQL
        # fold distinguishes NULL / NaN / Infinity
        import math

        rows = [
            (0, [1.0, 2.0, None, 4.0]),
            (1, [1.0, float("nan"), 3.0, 4.0]),
            (2, [float("inf"), 2.0, 3.0, 4.0]),
            (3, [1.0, 2.0, 3.0, float("-inf")]),
        ]
        df = spark.createDataFrame(rows, "id long, v array<double>")
        cent = spark.createDataFrame(
            [(5, [0.0] * 4), (8, [9.0] * 4)],
            "label int, centroid array<double>",
        )
        got_np = {
            r.id: (r.pred_label, r.dist)
            for r in similarity.centroid_assign(
                df, "id", "v", cent, impl="numpy"
            ).collect()
        }
        assert got_np == {i: (5, None) for i in range(4)}
        got_sql = {
            r.id: (r.pred_label, r.dist)
            for r in similarity.centroid_assign(
                df, "id", "v", cent, impl="sql"
            ).collect()
        }
        # pred_label agrees everywhere (smallest label on degenerates)
        assert {i: v[0] for i, v in got_sql.items()} == {
            i: v[0] for i, v in got_np.items()
        }
        # the SQL fold's richer taxonomy: NULL / NaN / Infinity
        assert got_sql[0][1] is None
        assert math.isnan(got_sql[1][1])
        assert math.isinf(got_sql[2][1]) and math.isinf(got_sql[3][1])

    def test_ivf_assign_vectorized_matches_scalar_loop(self, spark):
        # round-12: _assign's chunked (batch×k×dim) broadcast distance
        # must be bit-equal (incl. argmin tie-breaks) to the per-row
        # scalar loop it replaced, NULLs preserved
        import random

        rng = random.Random(7)
        rows = []
        for i in range(300):
            if i % 37 == 0:
                rows.append((i, None))
            else:
                rows.append(
                    (i, [rng.uniform(-1, 1) for _ in range(8)])
                )
        # plant exact ties: duplicate coordinates so two centroids can
        # be equidistant from some rows
        rows += [(1000 + j, [0.0] * 8) for j in range(5)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        assigned, centroids = similarity.ivf_build(
            df, "embedding", dim=8, n_clusters=4, sample=128, seed=3
        )
        got = {
            r.vec_id: r.ivf_cluster
            for r in assigned.select("vec_id", "ivf_cluster").collect()
        }
        cmat = np.array(centroids, dtype=np.float64)
        for vid, v in rows:
            if v is None:
                assert got[vid] is None
            else:
                x = np.asarray(v, dtype=np.float64)
                want = int(((cmat - x[None, :]) ** 2).sum(axis=1).argmin())
                assert got[vid] == want, vid

    def test_embedding_dup_pairs_finds_identical(self, spark, embeddings):
        two = embeddings.limit(2)
        dup = two.union(two)  # duplicate every vector
        pairs = similarity.embedding_dup_pairs(
            dup.withColumn("vec_id2", F.monotonically_increasing_id()),
            "vec_id2",
            "embedding",
            dim=64,
            threshold=0.999,
        )
        assert pairs.count() >= 2  # each duplicated vector pairs with itself


class TestNewOperatorPlans:
    """Plan-shape assertions for the round-2 pipeline operators: what
    must NOT shuffle doesn't, and scans stay pruned."""

    def test_chunk_documents_no_exchange(self, documents):
        from datafusion_functions_json_spark.plans import explain_str

        plan = explain_str(
            text.chunk_documents(
                documents, "doc_id", "text", chunk_tokens=64, overlap=16
            )
        )
        assert "Exchange" not in plan
        # column pruning reaches the scan: only doc_id + text read
        assert "title" not in plan.split("ReadSchema")[-1]

    def test_hash_split_no_exchange(self, documents):
        from datafusion_functions_json_spark.plans import explain_str

        plan = explain_str(split.hash_split(documents, "doc_id"))
        assert "Exchange" not in plan

    def test_pack_batches_single_shuffle(self, spark):
        from datafusion_functions_json_spark.plans import explain_str

        df = spark.createDataFrame([(i, 10) for i in range(50)], "id long, nt int")
        plan = explain_str(split.pack_batches(df, "id", "nt", budget=100, shards=4))
        # exactly one hash exchange (the shard key), no range/global sort
        assert plan.count("Exchange hashpartitioning") == 1
        assert "rangepartitioning" not in plan

    def test_tf_idf_two_aggregate_shuffles_only(self, documents):
        from datafusion_functions_json_spark.plans import explain_str

        plan = explain_str(text.tf_idf(documents, "doc_id", "text"))
        # no ArrowEvalPython (pure Catalyst) and the 1-row corpus count
        # arrives by broadcast, not a shuffle join
        assert "ArrowEvalPython" not in plan
        assert "BroadcastNestedLoopJoin" in plan


class TestRecall:
    def test_recall_full_probe_is_one(self, spark, embeddings):
        import pyarrow.parquet as pq

        q = [float(x) for x in pq.read_table(
            SF_DIR + "/embeddings.parquet"
        ).slice(0, 1).column("embedding").to_pylist()[0]]
        exact = similarity.cosine_topk(embeddings, "embedding", q, k=5)
        # n_planes=2 + multiprobe=2 covers all 4 buckets -> exact result
        approx = similarity.ann_topk(
            embeddings, "embedding", q, k=5, n_planes=2, multiprobe=2
        )
        r = similarity.recall_at_k(approx, exact, k=5).collect()[0]
        assert (r.k, r.hits, r.recall) == (5, 5, 1.0)


class TestPipeline:
    def test_curate_end_to_end(self, spark, documents):
        from datafusion_functions_json_spark.operators import pipeline

        kept = pipeline.curate(
            documents, min_tokens=5, quality_threshold=0.0, near_dedup=True
        )
        rows = kept.collect()
        assert len(rows) > 0
        assert {"lang", "quality", "n_tokens", "fingerprint"} <= set(kept.columns)
        # exact duplicates removed: texts unique
        texts = [r.text for r in rows]
        assert len(texts) == len(set(texts))
        stats = pipeline.curation_stats(documents, kept).collect()[0]
        assert stats.n_out == len(rows) and 0 < stats.survival_rate <= 1

    def test_curate_balanced_caps_each_source(self, spark, documents):
        from datafusion_functions_json_spark.operators import pipeline

        strict = pipeline.curate_strict(
            documents,
            languages=("en",),
            min_tokens=10,
            gopher_kwargs=dict(min_words=20, min_required_stopwords=1),
        )
        out = pipeline.curate_balanced(
            documents,
            cap=3,
            languages=("en",),
            min_tokens=10,
            gopher_kwargs=dict(min_words=20, min_required_stopwords=1),
        )
        per_src = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert per_src and max(per_src.values()) <= 3
        # the cap keeps each source's BEST survivors: per source, kept
        # clf_scores dominate dropped ones
        kept = {(r.source, r.doc_id): r.clf_score for r in out.collect()}
        allrows = [
            (r.source, r.doc_id, r.clf_score) for r in strict.collect()
        ]
        for src in per_src:
            kept_scores = sorted(
                (v for (s, _), v in kept.items() if s == src), reverse=True
            )
            dropped = [
                c for s, d, c in allrows
                if s == src and (s, d) not in kept
            ]
            if dropped and kept_scores:
                assert min(kept_scores) >= max(dropped)

    def test_training_prep_end_to_end(self, spark, documents):
        from datafusion_functions_json_spark.operators import pipeline

        prep = pipeline.training_prep(
            documents,
            splits={"train": 0.8, "val": 0.2},
            salt="t",
            chunk_tokens=32,
            overlap=8,
            batch_budget=128,
            shards=4,
            deterministic_shard=True,
            min_tokens=5,
            quality_threshold=0.0,
            near_dedup=False,
        )
        rows = prep.collect()
        assert len(rows) > 0
        assert {"chunk_id", "tok_start", "split", "shard", "batch_id"} <= set(
            prep.columns
        )
        # batches are split-pure: the shard label embeds the split
        for r in rows:
            assert r.shard.startswith(r.split + "#")
        # chunks never exceed the window
        assert max(r.n_tokens for r in rows) <= 32

    def test_identical_corpus_skew(self, spark):
        # degenerate skew: ALL documents identical -> one LSH mega-bucket;
        # must still complete and keep exactly one
        from datafusion_functions_json_spark.operators import pipeline

        df = spark.createDataFrame(
            [(i, "the same exact document body with enough tokens to pass the gate") for i in range(200)],
            "doc_id long, text string",
        )
        kept = pipeline.curate(df, min_tokens=5, quality_threshold=0.0)
        assert kept.count() == 1
        assert kept.first().doc_id == 0


class TestMultimodal:
    def _media_df(self, spark):
        rows = [
            (1, "image", bytearray(b"\x89PNG fake bytes 1"), "image/png", (4, 4, None, None)),
            (2, "image", bytearray(b"\x89PNG other bytes 22"), "image/png", (8, 8, None, None)),
            (3, "video", None, "video/mp4", (None, None, 3500, None)),
        ]
        return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    def test_real_decode_undecodable_rows_are_null(self, spark):
        # fake bytes aren't a decodable image: real path yields NULL
        # fields per row, never a task failure
        df = self._media_df(spark)
        rows = {r.media_id: r for r in multimodal.decode_image(df).collect()}
        assert rows[1].height is None and rows[1].features is None
        assert rows[3].height is None  # null payload

    def test_real_decode_png_through_spark(self, spark):
        from test_codecs import _checker, encode_png

        px1, px2 = _checker(12, 8, 3), _checker(6, 6, 1)
        rows = [
            (1, "image", bytearray(encode_png(px1, 4)), "image/png", (None, None, None, None)),
            (2, "image", bytearray(encode_png(px2, 2)), "image/png", (None, None, None, None)),
            (3, "image", bytearray(b"garbage"), "image/png", (None, None, None, None)),
        ]
        df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        got = {r.media_id: r for r in multimodal.decode_image(df).collect()}
        assert (got[1].height, got[1].width, got[1].channels) == (12, 8, 3)
        assert (got[2].height, got[2].width, got[2].channels) == (6, 6, 1)
        assert len(got[1].features) == 16 and all(0 <= v <= 1 for v in got[1].features)
        assert got[3].height is None and got[3].features is None

    def test_real_audio_wav_through_spark(self, spark):
        import numpy as np
        from test_codecs import encode_wav

        samples = (np.sin(np.linspace(0, 20 * np.pi, 1600)) * 16000).astype(np.int16)
        rows = [
            (10, "audio", bytearray(encode_wav(samples, 16000)), "audio/wav", (None, None, None, None)),
            (11, "audio", bytearray(b"not audio"), "audio/wav", (None, None, None, None)),
            (12, "audio", None, "audio/wav", (None, None, None, None)),
        ]
        df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        got = {r.media_id: r for r in multimodal.extract_audio_features(df).collect()}
        assert got[10].sample_rate == 16000 and got[10].n_samples == 1600
        assert len(got[10].features) == 16
        assert got[11].sample_rate is None and got[12].sample_rate is None

    def test_fake_decode_deterministic(self, spark):
        df = self._media_df(spark)
        out = multimodal.decode_image(df, fake=True).filter(F.col("kind") == "image")
        rows = {r.media_id: r for r in out.collect()}
        assert len(rows[1].features) == 16
        again = multimodal.decode_image(df, fake=True).filter(F.col("media_id") == 1)
        assert again.first().features == rows[1].features

    def test_metadata_jvm_side(self, spark):
        df = multimodal.attach_media_metadata(self._media_df(spark))
        r = {x.media_id: x for x in df.collect()}
        assert r[1].payload_bytes == 17
        assert r[3].payload_bytes is None

    def test_frame_sample_plan(self, spark):
        plan = multimodal.frame_sample_plan(self._media_df(spark), every_ms=1000)
        assert [r.frame_ts_ms for r in plan.collect()] == [0, 1000, 2000, 3000]

    def test_real_video_avi_frames_through_spark(self, spark):
        import numpy as np
        from test_codecs import encode_avi

        # 4 solid-color 16x16 frames at 1 fps: every luma-grid cell of
        # frame i equals its closed-form Rec.601 luma, and ts->frame
        # index mapping (plus the BGR->RGB swap) is falsifiable because
        # each frame has a distinct, asymmetric (r,g,b)
        colors = [(200, 10, 30), (10, 200, 30), (30, 10, 200), (120, 130, 140)]
        frames = [np.full((16, 16, 3), c, np.uint8) for c in colors]
        rows = [
            (7, "video", bytearray(encode_avi(frames, fps=1)), "video/avi",
             (16, 16, 3500, None)),
            (8, "video", bytearray(b"not a video"), "video/mp4",
             (None, None, 1500, None)),
            (9, "video", None, "video/mp4", (None, None, 1500, None)),
        ]
        df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        out = multimodal.extract_video_features(df, every_ms=1000)
        got = {(r.media_id, r.frame_ts_ms): r.features for r in out.collect()}
        assert len(got) == 4 + 2 + 2
        for i, (r, g, b) in enumerate(colors):
            luma = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            feats = got[(7, i * 1000)]
            assert feats is not None and len(feats) == 16
            assert all(abs(v - luma) < 1e-9 for v in feats), (i, feats[0], luma)
        # undecodable / NULL payloads keep their frame rows, NULL features
        assert got[(8, 0)] is None and got[(9, 1000)] is None

    def test_fake_video_features_per_frame(self, spark):
        rows = [
            (3, "video", bytearray(b"\x00mp4 fake"), "video/mp4", (None, None, 3500, None)),
            (4, "video", None, "video/mp4", (None, None, 1500, None)),
        ]
        df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        out = multimodal.extract_video_features(df, every_ms=1000, fake=True)
        rows_out = out.collect()
        # media 3: frames 0..3000, media 4: 0..1000
        assert sorted(
            (r.media_id, r.frame_ts_ms) for r in rows_out
        ) == [(3, 0), (3, 1000), (3, 2000), (3, 3000), (4, 0), (4, 1000)]
        by_key = {(r.media_id, r.frame_ts_ms): r.features for r in rows_out}
        # deterministic and frame-dependent; null payload -> null features
        assert by_key[(3, 0)] != by_key[(3, 1000)]
        assert len(by_key[(3, 0)]) == 16
        assert by_key[(4, 0)] is None

    def test_audio_real_path_non_wav_is_null(self, spark):
        got = {
            r.media_id: r
            for r in multimodal.extract_audio_features(self._media_df(spark)).collect()
        }
        assert all(r.sample_rate is None and r.features is None for r in got.values())

    def test_fake_audio_features_deterministic(self, spark):
        rows = [
            (10, "audio", bytearray(b"RIFF fake wav 123456"), "audio/wav", (None, None, 1000, 16000)),
            (11, "audio", bytearray(b"RIFF other wav 9"), "audio/wav", (None, None, 500, 44100)),
            (12, "audio", None, "audio/wav", (None, None, None, None)),
        ]
        df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
        out = {r.media_id: r for r in multimodal.extract_audio_features(df, fake=True).collect()}
        assert out[10].n_samples == 10 and out[10].sample_rate == 44100
        assert len(out[10].features) == 16
        assert out[12].features is None and out[12].sample_rate is None
        again = multimodal.extract_audio_features(df, fake=True).filter(
            F.col("media_id") == 10
        ).first()
        assert again.features == out[10].features


class TestCheckConstraints:
    def test_all_kinds_and_metrics(self, spark):
        from datafusion_functions_json_spark.operators import validate

        rows = [
            (1, 10.0, "F", "1-URGENT"),
            (2, -5.0, "O", "9-BAD"),
            (2, 50.0, None, None),
            (None, 200.0, "X", "3-MEDIUM"),
        ]
        df = spark.createDataFrame(rows, "id long, v double, s string, p string")
        out = {
            (r.check, r.target): r
            for r in validate.check_constraints(
                df,
                [
                    ("not_null", "id"),
                    ("unique", "id"),
                    ("min_value", "v", 0.0),
                    ("max_value", "v", 100.0),
                    ("between", "v", 0.0, 100.0),
                    ("in_set", "s", ["F", "O"]),
                    ("matches", "p", "^[1-5]-"),
                ],
            ).collect()
        }
        assert out[("not_null", "id")].violations == 1
        assert out[("unique", "id")].violations == 1  # id=2 twice
        assert out[("min_value", "v")].violations == 1  # -5
        assert out[("max_value", "v")].violations == 1  # 200
        assert out[("between", "v")].violations == 2
        assert out[("in_set", "s")].violations == 1  # 'X'; NULL not counted
        assert out[("matches", "p")].violations == 1  # 9-BAD; NULL skipped
        assert not out[("between", "v")].passed
        assert all(
            r.passed == (r.violations == 0) for r in out.values()
        )

    def test_single_aggregation_pass(self, spark):
        # every check must fold into ONE aggregate over ONE scan — the
        # plan has exactly one pair of partial/final HashAggregate (plus
        # the Expand that countDistinct adds), never per-check subtrees
        from datafusion_functions_json_spark.operators import validate

        df = spark.createDataFrame([(1, "a")], "id long, s string")
        out = validate.check_constraints(
            df,
            [("not_null", "id"), ("unique", "id"), ("in_set", "s", ["a"])],
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re

        # one partial + one final (ObjectHashAggregate/SortAggregate name
        # varies with distinct rewriting; count *Aggregate operators)
        n_aggs = len(re.findall(r"(?:Hash|Sort|ObjectHash)Aggregate", plan))
        assert n_aggs <= 4, plan  # two-phase agg x distinct rewrite bound
        assert plan.count("Scan") <= 2

    def test_errors(self, spark):
        from datafusion_functions_json_spark.operators import validate

        df = spark.createDataFrame([(1,)], "id long")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            validate.check_constraints(df, [])
        with _pytest.raises(ValueError):
            validate.check_constraints(df, [("bogus", "id")])


class TestGopherFilter:
    """gopher_quality_flags: every A1.1 rule fires on a targeted
    deformation and a clean prose document passes all of them."""

    CLEAN = (
        "The quick brown fox jumps over the lazy dog to be of use and "
        "share that fine day with friends. " * 4
    )

    def _flags(self, spark, txt, **kw):
        df = spark.createDataFrame([(txt,)], "t string")
        return df.select(
            text.gopher_quality_flags("t", **kw).alias("g")
        ).collect()[0].g.asDict()

    def test_clean_doc_keeps(self, spark):
        g = self._flags(spark, self.CLEAN)
        assert g == {k: True for k in g}

    def test_word_count_bounds(self, spark):
        assert not self._flags(spark, "too short the of")["word_count_ok"]
        assert not self._flags(
            spark, self.CLEAN, max_words=10
        )["word_count_ok"]

    def test_symbol_ratio(self, spark):
        g = self._flags(spark, self.CLEAN + " " + "#" * 40)
        assert not g["symbol_ratio_ok"]
        # a single-line doc ending in '...' trips the ellipsis-line gate
        g2 = self._flags(spark, self.CLEAN + " wait... more... dots...")
        assert g2["ellipsis_ok"] is False

    def test_bullet_and_ellipsis_lines(self, spark):
        bullets = "\n".join(["• item one here", "- item two here", "* three"])
        assert not self._flags(spark, bullets)["bullet_ok"]
        ell = self.CLEAN + "\nRead on...\nMore soon...\nAgain..."
        assert not self._flags(spark, ell)["ellipsis_ok"]

    def test_alpha_and_stopwords(self, spark):
        nums = "the " + " ".join(str(n) for n in range(60))
        g = self._flags(spark, nums)
        assert not g["alpha_word_ok"]
        no_stop = "lorem dolor amet " * 20
        assert not self._flags(spark, no_stop)["stopword_ok"]

    def test_repetition_gates(self, spark):
        rep = self.CLEAN + ("\nSame footer line." * 8)
        g = self._flags(spark, rep)
        assert not g["dup_line_ok"]

    def test_null_and_empty(self, spark):
        df = spark.createDataFrame([(None,), ("",)], "t string")
        rows = df.select(
            text.gopher_quality_flags("t").alias("g")
        ).collect()
        assert rows[0].g.keep is None
        assert rows[1].g.keep is False


class TestC4Clean:
    def _clean(self, spark, txt, **kw):
        df = spark.createDataFrame([(txt,)], "t string")
        return df.select(text.c4_clean("t", **kw).alias("c")).collect()[0].c

    GOOD = (
        "This is a perfectly good sentence line.\n"
        "Another good long sentence line sits here!\n"
        "A third proper sentence line finishes it."
    )

    def test_keeps_good_lines(self, spark):
        c = self._clean(spark, self.GOOD)
        assert not c.doc_dropped
        assert c.n_lines_kept == 3 and c.n_lines_dropped == 0
        assert c.cleaned_text == self.GOOD

    def test_drops_unterminated_and_short_lines(self, spark):
        c = self._clean(spark, self.GOOD + "\nno terminal punct here\nTiny.")
        assert c.n_lines_kept == 3 and c.n_lines_dropped == 2

    def test_drops_javascript_lines(self, spark):
        c = self._clean(
            spark, self.GOOD + "\nPlease enable JavaScript to continue now."
        )
        assert c.n_lines_kept == 3

    def test_doc_gates(self, spark):
        assert self._clean(spark, "Only one good sentence line here.").doc_dropped
        assert self._clean(spark, self.GOOD + "\ncss { x }").doc_dropped
        assert self._clean(
            spark, self.GOOD + "\nLorem Ipsum dolor sit amet fill."
        ).doc_dropped
        assert self._clean(spark, self.GOOD).doc_dropped is False

    def test_thresholds_are_tunable(self, spark):
        c = self._clean(spark, "Only one good sentence line here.",
                        min_kept_lines=1)
        assert not c.doc_dropped
        c2 = self._clean(spark, self.GOOD, min_line_words=8)
        assert c2.n_lines_kept == 0 and c2.doc_dropped


class TestSemanticDedup:
    def test_planted_copy_pair_drops_exactly_one(self, spark, embeddings):
        emb = embeddings.filter(F.col("vec_id") < 40)
        planted = emb.filter(F.col("vec_id") < 6).select(
            (F.col("vec_id") + 5000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * F.lit(1.001)).cast("float")
            ).alias("embedding"),
            "label",
        )
        out = similarity.semantic_dedup(
            emb.unionByName(planted), "vec_id", "embedding",
            k=4, iters=1, threshold=0.99, salt="t",
        ).cache()
        assert out.count() == 46
        # each (orig, copy) pair loses exactly one member; nothing else
        # is near-identical in the synthetic corpus
        assert out.filter("dropped").count() == 6
        dropped = {r.vec_id for r in out.filter("dropped").collect()}
        for vid in range(6):
            assert (vid in dropped) != (vid + 5000 in dropped)
        # copies share their original's cluster
        cl = {r.vec_id: r.cluster for r in out.collect()}
        for vid in range(6):
            assert cl[vid] == cl[vid + 5000]

    def test_threshold_gates_pairs(self, spark, embeddings):
        emb = embeddings.filter(F.col("vec_id") < 40)
        out = similarity.semantic_dedup(
            emb, "vec_id", "embedding", k=4, iters=1, threshold=0.99, salt="t"
        )
        # natural max cosine in the synthetic corpus is ~0.5
        assert out.filter("dropped").count() == 0
        out2 = similarity.semantic_dedup(
            emb, "vec_id", "embedding", k=2, iters=1, threshold=0.3, salt="t"
        )
        assert out2.filter("dropped").count() > 0

    def test_deterministic(self, spark, embeddings):
        emb = embeddings.filter(F.col("vec_id") < 30)
        a = similarity.semantic_dedup(
            emb, "vec_id", "embedding", k=3, iters=2, threshold=0.4, salt="x"
        ).orderBy("vec_id").collect()
        b = similarity.semantic_dedup(
            emb, "vec_id", "embedding", k=3, iters=2, threshold=0.4, salt="x"
        ).orderBy("vec_id").collect()
        assert a == b

    def test_derived_k_floor(self, spark, embeddings):
        # k=None derives k = max(8, ceil(n/target)): 40 rows / 5000 →
        # the floor of 8 — identical decisions to an explicit k=8 run.
        emb = embeddings.filter(F.col("vec_id") < 40)
        derived = similarity.semantic_dedup(
            emb, "vec_id", "embedding", iters=1, threshold=0.99, salt="t"
        ).orderBy("vec_id").collect()
        explicit = similarity.semantic_dedup(
            emb, "vec_id", "embedding", k=8, iters=1, threshold=0.99, salt="t"
        ).orderBy("vec_id").collect()
        assert derived == explicit

    def test_derived_k_scales_with_corpus(self, spark, embeddings):
        # above the floor: 40 rows with target_cluster_size=3 →
        # k = ceil(40/3) = 14 distinct clusters available; the run must
        # fan out past the k=8 floor (strictly more clusters used than
        # a floor-k run could ever produce is not guaranteed for tiny
        # n, so assert the cluster-id RANGE reflects the derived k).
        emb = embeddings.filter(F.col("vec_id") < 40)
        out = similarity.semantic_dedup(
            emb, "vec_id", "embedding", target_cluster_size=3,
            iters=1, threshold=0.99, salt="t",
        )
        max_cluster = out.agg(F.max("cluster")).collect()[0][0]
        assert max_cluster >= 8  # impossible under the k=8 floor (ids 0..7)

    def test_derived_k_rejects_bad_target(self, spark, embeddings):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="target_cluster_size"):
            similarity.semantic_dedup(
                embeddings, "vec_id", "embedding", target_cluster_size=0
            )

    def test_stage_prefixes_match_full_operator(self, spark, embeddings):
        # the sf10 gate's per-stage attribution entries (VERDICT r14
        # #1) are CUMULATIVE PREFIXES of semantic_dedup: the assign
        # stage must equal the decision table's first three columns
        # and the dropped stage its dropped-id set — same helpers,
        # same rounding grain, so byte-equal by construction; this pin
        # keeps a future operator edit from drifting the stage entries
        emb = embeddings.filter(F.col("vec_id") < 40)
        planted = emb.filter(F.col("vec_id") < 6).select(
            (F.col("vec_id") + 5000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: (x * F.lit(1.001)).cast("float")
            ).alias("embedding"),
            "label",
        )
        inp = emb.unionByName(planted)
        kw = dict(k=4, iters=1, salt="t")
        full = similarity.semantic_dedup(
            inp, "vec_id", "embedding", threshold=0.99, **kw
        ).cache()
        assign = similarity.semantic_dedup_assign(
            inp, "vec_id", "embedding", **kw
        )
        assert (
            assign.orderBy("vec_id").collect()
            == full.select("vec_id", "cluster", "cent_dist")
            .orderBy("vec_id")
            .collect()
        )
        dropped = similarity.semantic_dedup_dropped(
            inp, "vec_id", "embedding", threshold=0.99, **kw
        )
        assert (
            dropped.orderBy("vec_id").collect()
            == full.filter("dropped")
            .select("vec_id")
            .orderBy("vec_id")
            .collect()
        )


class TestGramTiles:
    """Round-17: the cache-resident tiled Gram iterator — and the
    tile-ASSEMBLED slab iterator `_gram_chunks` (knn_graph's top-k
    kernel) — must be bit-identical to the one-shot full-width Gram
    slab they replaced: every value equals the naive reference at the
    same (row, col), over random vectors, duplicated rows (the sf10
    replica shape), zero-norm rows, and values engineered to sit near
    the round-6 boundary. The reference is computed INLINE here (one
    unblocked matmul/outer/divide/round), so it stays independent of
    both production code paths. Spark-free (pure numpy)."""

    @staticmethod
    def _naive(V):
        from datafusion_functions_json_spark.operators.similarity import (
            _round6_half_up,
        )

        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0.0] = 1.0
        return _round6_half_up((V @ V.T) / np.outer(norms, norms))

    @staticmethod
    def _assemble(ids, V, fn, **kw):
        from datafusion_functions_json_spark.operators.similarity import (
            _gram_chunks,
            _gram_tiles,
        )

        n = len(ids)
        out = np.full((n, n), np.nan)
        if fn == "slab":
            for i0, cos in _gram_chunks(ids, V, kw.get("chunk", 97)):
                out[i0 : i0 + cos.shape[0], :] = cos
        else:
            for i0, j0, cos in _gram_tiles(
                ids, V, itile=kw.get("itile"), jtile=kw.get("jtile")
            ):
                out[i0 : i0 + cos.shape[0], j0 : j0 + cos.shape[1]] = cos
        return out

    def test_tiles_bit_equal_slab(self):
        rng = np.random.RandomState(17)
        base = rng.rand(23, 7)
        V = np.repeat(base, 11, axis=0)  # 253 rows, heavy duplication
        V[40] = 0.0  # zero-norm row (divides by 1)
        ids = np.arange(len(V))
        ref = self._naive(V)
        slab = self._assemble(ids, V, "slab", chunk=97)
        assert np.array_equal(slab, ref)
        for itile, jtile in ((256, 1024), (37, 41), (1, 253), (253, 1)):
            tiled = self._assemble(ids, V, "tiles", itile=itile, jtile=jtile)
            assert tiled.shape == ref.shape
            assert np.array_equal(tiled, ref), (itile, jtile)

    def test_assembled_chunks_bit_equal_naive(self):
        # chunk interacting with the internal i-subtile every way:
        # smaller, equal, larger-non-multiple, and the degenerate 1
        from datafusion_functions_json_spark.operators import similarity

        rng = np.random.RandomState(23)
        base = rng.rand(41, 16)
        V = np.repeat(base, 9, axis=0)  # 369 rows
        V[100] = 0.0
        ids = np.arange(len(V))
        ref = self._naive(V)
        orig_it, orig_jt = similarity._GRAM_ITILE, similarity._GRAM_JTILE
        try:
            similarity._GRAM_ITILE, similarity._GRAM_JTILE = 32, 48
            for chunk in (1, 17, 32, 100, 369, 1024):
                slab = self._assemble(ids, V, "slab", chunk=chunk)
                assert np.array_equal(slab, ref), chunk
        finally:
            similarity._GRAM_ITILE, similarity._GRAM_JTILE = orig_it, orig_jt

    def test_tiles_bit_equal_on_boundary_values(self):
        # vectors whose cosines land a hair around a .5 round-6
        # boundary: scaled near-collinear pairs — any arithmetic
        # reordering between the paths would flip the HALF_UP round
        rng = np.random.RandomState(5)
        a = rng.rand(64)
        V = np.vstack(
            [a * (1.0 + k * 5e-7) + rng.rand(64) * 1e-9 for k in range(90)]
        )
        ids = np.arange(len(V))
        ref = self._naive(V)
        slab = self._assemble(ids, V, "slab", chunk=13)
        tiled = self._assemble(ids, V, "tiles", itile=17, jtile=29)
        assert np.array_equal(slab, ref)
        assert np.array_equal(tiled, ref)


class TestGramTilesThresh:
    """Round-18: the float32-screen / float64-decide threshold-pair
    iterator must emit EXACTLY the pair set and rounded cosines the
    exact float64 path yields — the screen may only add candidates
    (recomputed and re-filtered in float64), never drop one. Pinned
    against the same inline naive reference TestGramTiles uses, over
    random vectors, duplicated rows, zero-norm rows, engineered
    threshold-boundary cosines (within float32 error of the
    threshold), round-6-boundary values, and the non-finite fallback
    arm. Spark-free (pure numpy)."""

    @staticmethod
    def _naive_pairs(V, threshold):
        ref = TestGramTiles._naive(V)
        ii, jj = np.nonzero(ref >= threshold)
        return set(zip(ii.tolist(), jj.tolist())), ref

    @staticmethod
    def _thresh_pairs(ids, V, threshold, **kw):
        from datafusion_functions_json_spark.operators.similarity import (
            _gram_tiles_thresh,
        )

        got = {}
        for gi, gj, cos in _gram_tiles_thresh(ids, V, threshold, **kw):
            for a, b, c in zip(gi.tolist(), gj.tolist(), cos.tolist()):
                assert (a, b) not in got  # each cell exactly once
                got[(a, b)] = c
        return got

    def test_matches_exact_path_random(self):
        rng = np.random.RandomState(18)
        base = rng.rand(23, 7)
        V = np.repeat(base, 11, axis=0)  # 253 rows, heavy duplication
        V[40] = 0.0  # zero-norm row (divides by 1)
        ids = np.arange(len(V))
        for threshold in (0.999999, 0.99, 0.9, 0.5, 0.0, -1.0):
            want, ref = self._naive_pairs(V, threshold)
            for itile, jtile in ((256, 1024), (37, 41), (1, 253)):
                got = self._thresh_pairs(
                    ids, V, threshold, itile=itile, jtile=jtile
                )
                assert set(got) == want, (threshold, itile, jtile)
                for (a, b), c in got.items():
                    assert c == ref[a, b], (threshold, a, b)

    def test_threshold_boundary_within_float32_error(self):
        # cosines engineered to land WITHIN float32 dot error of the
        # threshold (spacings 1e-9..1e-5 around it): the screen margin
        # must pass every true candidate through to the float64 decide
        rng = np.random.RandomState(7)
        a = rng.rand(64)
        a /= np.linalg.norm(a)
        b = rng.rand(64)
        b -= (b @ a) * a
        b /= np.linalg.norm(b)  # orthonormal pair
        threshold = 0.95
        rows = [a]
        for delta in (-1e-5, -1e-6, -1e-7, -1e-9, 0.0, 1e-9, 1e-7,
                      1e-6, 1e-5):
            c = threshold + delta
            if abs(c) > 1.0:
                continue
            rows.append(c * a + np.sqrt(max(0.0, 1 - c * c)) * b)
        V = np.vstack(rows)
        ids = np.arange(len(V))
        want, ref = self._naive_pairs(V, threshold)
        got = self._thresh_pairs(ids, V, threshold, itile=3, jtile=4)
        assert set(got) == want
        for (i, j), c in got.items():
            assert c == ref[i, j]

    def test_round6_boundary_values_match(self):
        # the TestGramTiles boundary family: near-collinear rows whose
        # cosines sit a hair around a .5 round-6 boundary — decisions
        # AND emitted values must match the exact path bit-for-bit
        rng = np.random.RandomState(5)
        a = rng.rand(64)
        V = np.vstack(
            [a * (1.0 + k * 5e-7) + rng.rand(64) * 1e-9 for k in range(90)]
        )
        ids = np.arange(len(V))
        for threshold in (0.9999995, 0.999999, 1.0):
            want, ref = self._naive_pairs(V, threshold)
            got = self._thresh_pairs(ids, V, threshold, itile=17, jtile=29)
            assert set(got) == want, threshold
            for (i, j), c in got.items():
                assert c == ref[i, j]

    def test_nonfinite_vectors_take_exact_path(self):
        rng = np.random.RandomState(3)
        V = rng.rand(20, 8)
        V[4, 2] = np.inf  # cast/normalize -> non-finite float32
        V[9, 0] = np.nan
        ids = np.arange(len(V))
        threshold = 0.9
        want, ref = self._naive_pairs(V, threshold)
        got = self._thresh_pairs(ids, V, threshold, itile=6, jtile=7)
        assert set(got) == want
        for (i, j), c in got.items():
            assert c == ref[i, j]

    def test_huge_magnitudes_overflow_float32_safely(self):
        # values above float32 max: float64 NORMALIZATION happens
        # before the cast, so the normalized rows are finite and the
        # fast path still screens correctly
        rng = np.random.RandomState(9)
        V = rng.rand(30, 16)
        V[3] *= 1e300
        V[7] *= 1e-300  # denormal-range norms
        ids = np.arange(len(V))
        for threshold in (0.99, 0.7):
            want, ref = self._naive_pairs(V, threshold)
            got = self._thresh_pairs(ids, V, threshold)
            assert set(got) == want
            for (i, j), c in got.items():
                assert c == ref[i, j]


class TestSemanticDedupKernel:
    def test_gram_kernel_matches_pair_join_formulation(self, spark):
        # the grouped Gram-matmul kernel must reproduce the original
        # pair-join + pair_cosine_np path decision-for-decision: a low
        # threshold over random vectors fires hundreds of pairs, so a
        # rounding or drop-rule divergence cannot hide
        import random

        rng = random.Random(11)
        rows = [
            (
                i,
                i % 5,
                round(rng.uniform(0.0, 3.0), 4),
                [rng.gauss(0.0, 1.0) for _ in range(16)],
            )
            for i in range(200)
        ]
        # planted exact ties on cent_dist exercise the larger-id arm
        rows += [
            (1000, 0, rows[0][2], rows[0][3]),
            (1001, 1, 0.5, [0.0] * 16),  # zero vector: norm-1 fallback
            (1002, 1, 0.5, None),  # NULL vector never pairs
            # duplicate-id row (same id, same vector): the join's
            # strict id inequality never self-pairs it — the kernel
            # must match (id-based exclusion, not positional)
            (7, 7 % 5, rows[7][2], rows[7][3]),
        ]
        base = spark.createDataFrame(
            rows,
            "_id long, cluster int, cent_dist double, _v array<double>",
        )
        got = {
            r._id
            for r in similarity._semdedup_dropped_ids(
                base, 0.3, chunk=37
            ).collect()
        }
        pairs = (
            base.alias("L")
            .join(base.alias("R"), F.col("L.cluster") == F.col("R.cluster"))
            .filter(F.col("L._id") < F.col("R._id"))
            .withColumn(
                "_cos",
                F.round(
                    similarity.pair_cosine_np(F.col("L._v"), F.col("R._v")),
                    6,
                ),
            )
            .filter(F.col("_cos") >= 0.3)
        )
        da, db = F.col("L.cent_dist"), F.col("R.cent_dist")
        want = {
            r._id
            for r in pairs.select(
                F.when(da < db, F.col("L._id"))
                .when(db < da, F.col("R._id"))
                .otherwise(F.greatest(F.col("L._id"), F.col("R._id")))
                .alias("_id")
            )
            .distinct()
            .collect()
        }
        assert got == want and len(got) > 50


class TestHeavyHitters:
    def _skewed(self, spark):
        # zipf-ish: item i appears (40 - i) times, i in 0..39
        rows = [(f"w{i:02d}",) for i in range(40) for _ in range(40 - i)]
        return spark.createDataFrame(rows, "item string").repartition(8)

    def test_exact_topk_under_trimming(self, spark):
        from datafusion_functions_json_spark.operators import sketch

        df = self._skewed(spark)
        # capacity 30 < 40 distinct items forces real MG trimming, and
        # N/capacity = 820/30 ≈ 27 < 36 keeps the top-5 inside the
        # union guarantee — the result must be the exact top-5
        got = sketch.heavy_hitters(df, "item", k=5, capacity=30).collect()
        assert [(r.item, r.cnt) for r in got] == [
            ("w00", 40), ("w01", 39), ("w02", 38), ("w03", 37), ("w04", 36)
        ]

    def test_candidate_bound_and_lower_bounds(self, spark):
        from datafusion_functions_json_spark.operators import sketch

        df = self._skewed(spark)
        cand = sketch.misra_gries_candidates(df, "item", 10).toPandas()
        # ≤ capacity rows per partition
        assert len(cand) <= 10 * 8
        # lb never exceeds the true global count
        truth = {f"w{i:02d}": 40 - i for i in range(40)}
        for r in cand.itertuples():
            assert 0 < r.lb <= truth[r.item]

    def test_nulls_ignored_and_ties_deterministic(self, spark):
        from datafusion_functions_json_spark.operators import sketch

        df = spark.createDataFrame(
            [("a",), ("a",), ("b",), ("b",), ("c",), (None,)], "item string"
        )
        got = sketch.heavy_hitters(df, "item", k=2, capacity=10).collect()
        assert [(r.item, r.cnt) for r in got] == [("a", 2), ("b", 2)]

    def test_errors(self, spark):
        from datafusion_functions_json_spark.operators import sketch

        df = spark.createDataFrame([("a",)], "item string")
        with pytest.raises(ValueError):
            sketch.heavy_hitters(df, "item", 0)
        with pytest.raises(ValueError):
            sketch.misra_gries_candidates(df, "item", 0)


class TestTemperatureSample:
    def _df(self, spark):
        rows = [(i, "big") for i in range(900)] + [
            (i + 1000, "small") for i in range(100)
        ]
        return spark.createDataFrame(rows, "doc_id bigint, source string")

    def test_alpha_upweights_small_sources(self, spark):
        df = self._df(spark)
        nat = split.temperature_sample(
            df, "doc_id", "source", alpha=1.0, budget=100, salt="t"
        )
        flat = split.temperature_sample(
            df, "doc_id", "source", alpha=0.0, budget=100, salt="t"
        )
        nat_c = {r.source: r.n for r in nat.groupBy("source").agg(F.count("*").alias("n")).collect()}
        flat_c = {r.source: r.n for r in flat.groupBy("source").agg(F.count("*").alias("n")).collect()}
        # natural keeps the 9:1 skew; alpha=0 equalizes
        assert nat_c == {"big": 90, "small": 10}
        assert flat_c == {"big": 50, "small": 50}

    def test_target_capped_at_source_size(self, spark):
        df = self._df(spark)
        out = split.temperature_sample(
            df, "doc_id", "source", alpha=0.0, budget=400, salt="t"
        )
        c = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        # equal split wants 200/200 but 'small' only has 100 rows
        assert c == {"big": 200, "small": 100}

    def test_deterministic_and_errors(self, spark):
        df = self._df(spark)
        a = sorted(r.doc_id for r in split.temperature_sample(
            df, "doc_id", "source", alpha=0.5, budget=50, salt="x").collect())
        b = sorted(r.doc_id for r in split.temperature_sample(
            df, "doc_id", "source", alpha=0.5, budget=50, salt="x").collect())
        assert a == b and len(a) > 0
        with pytest.raises(ValueError):
            split.temperature_sample(df, "doc_id", "source", budget=0)
        with pytest.raises(ValueError):
            split.temperature_sample(df, "doc_id", "source", alpha=-1)


class TestPretokenCount:
    def _n(self, spark, txt):
        df = spark.createDataFrame([(txt,)], "t string")
        return df.select(text.pretoken_count("t").alias("n")).collect()[0].n

    def test_matches_python_re(self, spark, documents):
        import re

        pat = re.compile(text.BPE_PRETOKEN_PATTERN)
        rows = documents.select(
            "text", text.pretoken_count("text").alias("n")
        ).take(25)
        for r in rows:
            assert r.n == len(pat.findall(r.text))

    def test_segments(self, spark):
        # "it's" = [it]['s]; "42 miles," = [ 42][ miles][,]
        assert self._n(spark, "it's") == 2
        assert self._n(spark, "it's 42 miles,") == 5
        # punctuation runs group: "--" is one segment, "..." one
        assert self._n(spark, "a -- b ...") == 4
        # contraction arm beats the punct arm ('s then till)
        assert self._n(spark, "'still") == 2
        assert self._n(spark, "") == 0
        df = spark.createDataFrame([(None,)], "t string")
        assert df.select(text.pretoken_count("t").alias("n")).collect()[0].n is None


class TestQualityGateDifferential:
    """Seeded random corpus with bullets/ellipses/hashes/digits/newlines:
    full-row compare of gopher_quality_flags and c4_clean against a pure
    Python recomputation of the published rules."""

    def _corpus(self):
        import random

        rng = random.Random(7)
        words = ["the", "of", "and", "alpha", "beta", "42", "x#y", "gamma..."]
        frags = [
            "• item here",
            "- dash item",
            "1. numbered line",
            "Read more...",
            "A proper sentence line with enough words here.",
            "short one",
            "Please enable javascript now to see this content.",
            "####",
            "…",
        ]
        docs = []
        for i in range(120):
            parts = []
            for _ in range(rng.randrange(1, 7)):
                if rng.random() < 0.4:
                    parts.append(rng.choice(frags))
                else:
                    parts.append(
                        " ".join(rng.choice(words) for _ in range(rng.randrange(1, 30)))
                    )
            docs.append((i, "\n".join(parts)))
        return docs

    def test_gopher_matches_python(self, spark):
        import re

        docs = self._corpus()
        df = spark.createDataFrame(docs, "id long, t string")
        got = {
            r.id: r.g.asDict()
            for r in df.select(
                "id", text.gopher_quality_flags("t", min_words=5).alias("g")
            ).collect()
        }
        req = set(text.GOPHER_REQUIRED_STOPWORDS)
        for i, t in docs:
            toks = t.split()
            ls = [x.strip() for x in t.split("\n") if x.strip()]
            nw, nl = len(toks), len(ls)
            sw, sl = max(nw, 1), max(nl, 1)
            mean_len = sum(len(x) for x in toks) / sw
            sym = (t.count("#") + len(re.findall(r"\.\.\.|…", t))) / sw
            bullet = sum(
                1 for x in ls if re.match(r"^([•\-\*•]|\d+[.)])\s", x)
            ) / sl
            ell = sum(1 for x in ls if re.search(r"(\.\.\.|…)$", x)) / sl
            alpha = sum(1 for x in toks if re.search("[A-Za-z]", x)) / sw
            nstop = len({x.lower() for x in toks} & req)
            dls = list(dict.fromkeys(ls))
            dl = round((nl - len(dls)) / sl, 6)
            ch = sum(len(x) for x in ls)
            dch = sum(len(x) for x in dls)
            dc = round((ch - dch) / max(ch, 1), 6)
            want = {
                "word_count_ok": 5 <= nw <= 100000,
                "mean_word_len_ok": 3.0 <= mean_len <= 10.0,
                "symbol_ratio_ok": sym <= 0.1,
                "bullet_ok": bullet <= 0.9,
                "ellipsis_ok": ell <= 0.3,
                "alpha_word_ok": alpha >= 0.8,
                "stopword_ok": nstop >= 2,
                "dup_line_ok": dl <= 0.3,
                "dup_char_ok": dc <= 0.2,
            }
            want["keep"] = all(want.values())
            assert got[i] == want, (i, t)

    def test_c4_matches_python(self, spark):
        import re

        docs = self._corpus()
        df = spark.createDataFrame(docs, "id long, t string")
        got = {
            r.id: (r.c.cleaned_text, r.c.n_lines_kept, r.c.n_lines_dropped,
                   r.c.doc_dropped)
            for r in df.select("id", text.c4_clean("t").alias("c")).collect()
        }
        for i, t in docs:
            ls = [x.strip() for x in t.split("\n") if x.strip()]
            kept = [
                x for x in ls
                if re.search(r'[.!?"]$', x)
                and len(x.split()) >= 5
                and "javascript" not in x.lower()
                and "lorem ipsum" not in x.lower()
            ]
            dropped = (
                len(kept) < 3 or "{" in t or "lorem ipsum" in t.lower()
            )
            want = (
                None if dropped else "\n".join(kept),
                len(kept),
                len(ls) - len(kept),
                dropped,
            )
            assert got[i] == want, (i, t)


class TestImageDhash:
    def _ppm(self, rows):
        # rows: list of list of (r,g,b)
        h, w = len(rows), len(rows[0])
        body = bytes(c for row in rows for px in row for c in px)
        return b"P6\n%d %d\n255\n" % (w, h) + body

    def _grad(self, w=16, h=16, flip_bits=()):
        # horizontal luminance ramp -> all gradient bits set
        rows = [[(x * 16 % 256,) * 3 for x in range(w)] for _ in range(h)]
        return rows

    def test_dhash_known_patterns(self, spark):
        from datafusion_functions_json_spark.operators.multimodal import (
            _dhash_from_pixels,
        )
        import numpy as np

        solid = np.full((16, 16, 3), 100, dtype=np.uint8)
        assert _dhash_from_pixels(solid) == 0
        ramp = np.tile(
            (np.arange(16, dtype=np.uint8) * 15)[None, :, None], (16, 1, 3)
        )
        # strictly increasing luma -> every gradient bit set -> -1
        assert _dhash_from_pixels(ramp) == -1
        assert _dhash_from_pixels(None) is None

    def test_spark_decode_and_dup_pairs_exact(self, spark):
        ramp = [[(x * 15, x * 15, x * 15) for x in range(16)]] * 16
        solid = [[(9, 9, 9)] * 16] * 16
        rows = [
            (1, self._ppm(ramp)),
            (2, self._ppm(ramp)),      # exact perceptual dup of 1
            (3, self._ppm(solid)),
            (4, None),
            (5, b"notanimage"),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {
            r.media_id: r.dhash
            for r in multimodal.image_dhash(df, "payload").collect()
        }
        assert got[1] == got[2] == -1
        assert got[3] == 0
        assert got[4] is None and got[5] is None
        pairs = multimodal.image_dup_pairs(df, "media_id", "payload").collect()
        assert [(p.id_a, p.id_b, p.distance) for p in pairs] == [(1, 2, 0)]

    def test_jpeg_leg_without_pil(self, spark):
        # round 16 (VERDICT r15 #7): the JPEG leg of the decode chain is
        # REAL without PIL — the stdlib baseline decoder feeds the same
        # dHash, so a JPEG re-encode of an image perceptually matches
        # its lossless encoding (dHash's whole selling point)
        import numpy as np
        from datafusion_functions_json_spark.operators._codecs import (
            encode_jpeg,
        )

        ramp = np.tile(
            (np.arange(16, dtype=np.uint8) * 15)[None, :, None], (16, 1, 3)
        )
        rows = [
            (1, self._np_ppm(ramp)),
            (2, encode_jpeg(ramp, quality=95)),          # JPEG re-encode
            (3, encode_jpeg(ramp, quality=80)),          # harsher re-encode
            (4, encode_jpeg(ramp[:, :, 0], quality=95)),  # grayscale JPEG
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {
            r.media_id: r.dhash
            for r in multimodal.image_dhash(df, "payload").collect()
        }
        assert got[1] == got[2] == got[3] == got[4] == -1

    def test_hamming_blocked_join(self, spark):
        import numpy as np
        from datafusion_functions_json_spark.operators.multimodal import (
            _dhash_from_pixels,
        )

        # two ramps differing in ONE grid cell -> small hamming distance
        base = np.tile(
            (np.arange(16, dtype=np.uint8) * 15)[None, :, None], (16, 1, 3)
        ).copy()
        tweaked = base.copy()
        tweaked[0:2, 0:2, :] = 255  # flip the first row's first gradient bit
        d = bin(
            (_dhash_from_pixels(base) ^ _dhash_from_pixels(tweaked))
            & ((1 << 64) - 1)
        ).count("1")
        assert 1 <= d <= 3
        rows = [(1, self._np_ppm(base)), (2, self._np_ppm(tweaked))]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        assert multimodal.image_dup_pairs(
            df, "media_id", "payload", max_distance=0
        ).count() == 0
        got = multimodal.image_dup_pairs(
            df, "media_id", "payload", max_distance=3
        ).collect()
        assert [(p.id_a, p.id_b) for p in got] == [(1, 2)]
        assert got[0].distance == d
        with pytest.raises(ValueError):
            multimodal.image_dup_pairs(df, "media_id", max_distance=9)

    def _np_ppm(self, arr):
        h, w, _ = arr.shape
        return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


class TestNormalizeText:
    def _n(self, spark, txt, **kw):
        df = spark.createDataFrame([(txt,)], "t string")
        return df.select(text.normalize_text("t", **kw).alias("n")).collect()[0].n

    def test_variants_converge(self, spark):
        base = "Crème Brûlée, s'il vous plaît!"
        variants = [
            "creme brulee s il vous plait",
            "  CRÈME   BRÛLÉE -- s'il vous PLAÎT??  ",
            "creme,brulee;s il.vous:plait",
        ]
        want = self._n(spark, base)
        assert want == "creme brulee s il vous plait"
        for v in variants:
            assert self._n(spark, v) == want, v

    def test_toggles(self, spark):
        assert self._n(spark, "AbC", casefold=False) == "AbC"
        assert (
            self._n(spark, "a-b", strip_punct=False, collapse_ws=False)
            == "a-b"
        )
        # opting out of accent folding PRESERVES accented letters (the
        # earlier behavior stripped them as punctuation — reviewed bug)
        assert self._n(spark, "é", strip_accents=False) == "é"
        assert self._n(spark, None) is None

    def test_dedup_key_groups_variants(self, spark):
        rows = [
            (1, "Hello, World!"),
            (2, "  hello   world  "),
            (3, "héllo wörld"),
            (4, "different text"),
        ]
        df = spark.createDataFrame(rows, "id long, t string")
        keys = {
            r.id: r.k
            for r in df.select(
                "id", text.normalized_dedup_key("t").alias("k")
            ).collect()
        }
        assert keys[1] == keys[2] == keys[3]
        assert keys[4] != keys[1]


class TestCurriculumRank:
    def test_equals_global_row_number(self, spark):
        import random

        rng = random.Random(3)
        rows = [(i, rng.uniform(-0.2, 1.3)) for i in range(500)]  # incl. out-of-range
        df = spark.createDataFrame(rows, "id long, s double").repartition(7)
        got = {
            r.id: r.curriculum_rank
            for r in split.curriculum_rank(
                df, "id", "s", n_buckets=8
            ).collect()
        }
        want = {
            i: rk + 1
            for rk, (i, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
        }
        assert got == want

    def test_ties_break_by_id(self, spark):
        df = spark.createDataFrame(
            [(3, 0.5), (1, 0.5), (2, 0.5)], "id long, s double"
        )
        got = {
            r.id: r.curriculum_rank
            for r in split.curriculum_rank(df, "id", "s", n_buckets=4).collect()
        }
        assert got == {1: 1, 2: 2, 3: 3}

    def test_errors(self, spark):
        df = spark.createDataFrame([(1, 0.5)], "id long, s double")
        with pytest.raises(ValueError):
            split.curriculum_rank(df, "id", "s", n_buckets=0)
        with pytest.raises(ValueError):
            split.curriculum_rank(df, "id", "s", lo=1.0, hi=1.0)


class TestTopNgramFraction:
    def _f(self, spark, txt, n=2):
        df = spark.createDataFrame([(txt,)], "t string")
        return df.select(
            text.top_ngram_char_fraction("t", n=n).alias("f")
        ).collect()[0].f

    def test_known_values(self, spark):
        # "a b a b a": bigrams [a b, b a, a b, b a]; top = "b a" (tie,
        # later gram); covered = 2*2 = 4 chars of 5 token chars
        assert self._f(spark, "a b a b a") == round(4 / 5, 6)
        # all-distinct bigrams: top count 1
        assert self._f(spark, "q w e r t") == round(2 / 5, 6)
        # repeated phrase dominates
        assert self._f(spark, "x y " * 10) == 1.0

    def test_edges(self, spark):
        assert self._f(spark, "one") == 0.0
        assert self._f(spark, "") == 0.0
        df = spark.createDataFrame([(None,)], "t string")
        assert df.select(
            text.top_ngram_char_fraction("t").alias("f")
        ).collect()[0].f is None
        with pytest.raises(ValueError):
            text.top_ngram_char_fraction("t", n=0)

    def test_matches_python(self, spark, documents):
        from collections import Counter

        rows = documents.select(
            "text", text.top_ngram_char_fraction("text", n=3).alias("f")
        ).take(30)
        for r in rows:
            toks = r.text.split()
            grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
            if len(toks) < 3:
                assert r.f == 0.0
                continue
            cnt = Counter(grams)
            best = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))
            covered = best[1] * (len(best[0]) - 2)
            want = round(covered / max(sum(map(len, toks)), 1), 6)
            assert r.f == want, r.text


class TestQualityClassifier:
    def test_ranks_prose_above_junk(self, spark):
        rows = [
            (1, "The quick brown fox jumps over the lazy dog and it is a "
                "fine day for everyone in the meadow to be happy."),
            (2, "$$$ ### ;;; ,,, !!! ??? %%% @@@ ^^^ &&&"),
            (3, "a a a a a a a a a a a a a a a a"),
        ]
        df = spark.createDataFrame(rows, "id long, t string")
        got = {
            r.id: r.s
            for r in df.select(
                "id", text.quality_classifier_score("t").alias("s")
            ).collect()
        }
        assert got[1] > got[2] and got[1] > got[3]
        assert all(0.0 < v < 1.0 for v in got.values())

    def test_custom_weights_and_errors(self, spark):
        df = spark.createDataFrame([("hello there",)], "t string")
        zero = df.select(
            text.quality_classifier_score(
                "t", weights=(0,) * 6, bias=0.0
            ).alias("s")
        ).collect()[0].s
        assert zero == 0.5
        with pytest.raises(ValueError):
            text.quality_classifier_score("t", weights=(1.0,))


class TestFuzzyDecontaminate:
    def test_drops_near_copies_keeps_disjoint(self, spark):
        bench = spark.createDataFrame(
            [(100, "the secret benchmark question about gravity waves")],
            "doc_id bigint, text string",
        )
        train = spark.createDataFrame(
            [
                (1, "the secret benchmark question about gravity waves!"),
                (2, "entirely unrelated cooking recipe with pasta and basil"),
                (3, "the secret benchmark question about gravity waves and more"),
            ],
            "doc_id bigint, text string",
        )
        out = dedup.fuzzy_decontaminate(
            train, "doc_id", "text", bench, threshold=0.6
        )
        assert sorted(r.doc_id for r in out.collect()) == [2]

    def test_mismatched_family_rejected(self, spark):
        bench = spark.createDataFrame(
            [(1, "abc def ghi jkl")], "doc_id bigint, text string"
        )
        idx = dedup.minhash_index(bench, "doc_id", "text", num_perm=32)
        with pytest.raises(ValueError):
            dedup.minhash_dup_pairs_against(
                bench, idx, "doc_id", "text", num_perm=64
            )


class TestCorpusQualityReport:
    def test_metrics_per_group(self, spark):
        rows = [
            (1, "the cat sat on the mat and it is happy here today now "
                "with more of the fine words that have come along " * 2, "a"),
            (2, "der hund ist ein tier und das ist gut so heute " * 5, "a"),
            (3, "tiny", "b"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, src string")
        got = {
            r.group: r.asDict()
            for r in text.corpus_quality_report(df, "doc_id", "text", "src").collect()
        }
        assert got["a"]["n_docs"] == 2 and got["b"]["n_docs"] == 1
        assert got["a"]["total_tokens"] > got["b"]["total_tokens"]
        # group a mixes en + de -> positive entropy; b single lang -> 0.0
        assert got["a"]["lang_entropy"] > 0.0
        assert got["b"]["lang_entropy"] == 0.0
        assert 0.0 <= got["a"]["gopher_keep_rate"] <= 1.0


class TestRoundSixEdges:
    """Empty/degenerate inputs for the round-6 operators: libraries get
    called on empty filters and tiny corpora; none of these may throw."""

    def test_heavy_hitters_empty(self, spark):
        from datafusion_functions_json_spark.operators import sketch

        df = spark.createDataFrame([], "item string")
        assert sketch.heavy_hitters(df, "item", 3).count() == 0

    def test_semantic_dedup_k_exceeds_n(self, spark, embeddings):
        emb = embeddings.filter(F.col("vec_id") < 5)
        out = similarity.semantic_dedup(
            emb, "vec_id", "embedding", k=16, iters=1, threshold=0.99, salt="e"
        )
        assert out.count() == 5
        assert out.filter("dropped").count() == 0

    def test_curriculum_empty_and_single(self, spark):
        empty = spark.createDataFrame([], "id long, s double")
        assert split.curriculum_rank(empty, "id", "s").count() == 0
        one = spark.createDataFrame([(7, 0.3)], "id long, s double")
        got = split.curriculum_rank(one, "id", "s").collect()
        assert got[0].curriculum_rank == 1

    def test_temperature_sample_empty(self, spark):
        empty = spark.createDataFrame([], "doc_id long, source string")
        assert split.temperature_sample(
            empty, "doc_id", "source", budget=10
        ).count() == 0

    def test_gopher_c4_empty_frame(self, spark):
        empty = spark.createDataFrame([], "t string")
        assert empty.select(
            text.gopher_quality_flags("t").alias("g"),
            text.c4_clean("t").alias("c"),
            text.top_ngram_char_fraction("t").alias("f"),
            text.pretoken_count("t").alias("p"),
            text.normalize_text("t").alias("n"),
        ).count() == 0

    def test_image_dhash_empty_and_tiny(self, spark):
        df = spark.createDataFrame([], "media_id long, payload binary")
        assert multimodal.image_dhash(df).count() == 0
        # 1x1 image: degenerate grid still hashes (all cells equal)
        one = spark.createDataFrame(
            [(1, b"P6\n1 1\n255\n\x10\x20\x30")], "media_id long, payload binary"
        )
        assert one.select("media_id").count() == 1
        got = multimodal.image_dhash(one).collect()[0]
        assert got.dhash == 0

    def test_fuzzy_decontam_empty_train(self, spark):
        bench = spark.createDataFrame(
            [(1, "abc def ghi jkl mno")], "doc_id bigint, text string"
        )
        empty = spark.createDataFrame([], "doc_id bigint, text string")
        assert dedup.fuzzy_decontaminate(
            empty, "doc_id", "text", bench
        ).count() == 0

    def test_corpus_report_single_row(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat is here", "s")], "doc_id long, text string, src string"
        )
        r = text.corpus_quality_report(df, "doc_id", "text", "src").collect()
        assert len(r) == 1 and r[0].n_docs == 1


class TestPackPositions:
    def test_spans_tile_each_batch(self, spark):
        rows = [(i, 30) for i in range(20)]
        df = spark.createDataFrame(rows, "id long, nt long")
        out = split.pack_positions(
            df, "id", "nt", budget=100, shards=1,
            shard_expr=F.lit(0),
        ).orderBy("id").collect()
        # 30-token docs into budget 100: prefix 0,30,60,90,120,... —
        # doc 3 straddles (starts at 90, ends at 120 > budget)
        assert (out[0].batch_id, out[0].seq_start, out[0].seq_end) == (0, 0, 30)
        assert (out[3].batch_id, out[3].seq_start, out[3].seq_end) == (0, 90, 120)
        assert (out[4].batch_id, out[4].seq_start, out[4].seq_end) == (1, 20, 50)
        # within a batch, spans are contiguous per construction:
        # next.seq_start == prev.seq_end (mod budget boundary straddle)
        for prev, nxt in zip(out, out[1:]):
            if prev.batch_id == nxt.batch_id:
                assert nxt.seq_start == prev.seq_end

    def test_matches_pack_batches_assignment(self, spark):
        rows = [(i, 7 + (i * 13) % 50) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, nt long")
        a = {
            r.id: (r.shard, r.batch_id)
            for r in split.pack_batches(df, "id", "nt", budget=300, shards=4).collect()
        }
        b = {
            r.id: (r.shard, r.batch_id)
            for r in split.pack_positions(df, "id", "nt", budget=300, shards=4).collect()
        }
        assert a == b


class TestAudioFingerprint:
    def test_bits_from_known_bands(self, spark):
        rows = [
            (1, [float(i) for i in range(16)]),        # strictly rising
            (2, [5.0] * 16),                           # flat
            (3, None),
            (4, [1.0] * 8 + [2.0] * 8),                # one step at bit 7
        ]
        df = spark.createDataFrame(rows, "id long, f array<double>")
        got = {
            r.id: r.fp
            for r in df.select(
                "id", multimodal.audio_fingerprint_bits("f").alias("fp")
            ).collect()
        }
        assert got[1] == (1 << 15) - 1
        assert got[2] == 0
        assert got[3] is None
        assert got[4] == 1 << 7

    def test_gain_invariance_end_to_end(self, spark):
        import struct

        def wav(samples):
            data = b"".join(struct.pack("<h", s) for s in samples)
            hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            hdr += b"data" + struct.pack("<I", len(data))
            return hdr + data

        base = [100 * (1 + i // 100) for i in range(1600)]  # rising stairs
        df = spark.createDataFrame(
            [(1, wav(base)), (2, wav([s * 3 for s in base]))],
            "media_id long, payload binary",
        )
        out = multimodal.extract_audio_features(df).select(
            "media_id",
            multimodal.audio_fingerprint_bits("features").alias("fp"),
        ).collect()
        fps = {r.media_id: r.fp for r in out}
        assert fps[1] == fps[2] == (1 << 15) - 1  # gain-invariant, all rising


class TestCurateStrict:
    EN = (
        "The quick brown fox jumps over the lazy dog to be of use and "
        "share that fine day with friends in the park. " * 3
    )

    def _base(self, spark):
        from datafusion_functions_json_spark.operators import pipeline

        rows = [
            (1, self.EN),
            (2, self.EN.upper()),                      # normalized dup of 1
            (3, "  " + self.EN + " !!"),               # normalized dup of 1
            (4, "der hund ist ein tier und das ist gut so heute " * 6),
            (5, "#### " * 40 + self.EN),               # gopher symbol fail
            (6, "tiny doc"),
        ]
        return pipeline, spark.createDataFrame(rows, "doc_id long, text string")

    def test_gates_and_normalized_dedup(self, spark):
        pipeline, df = self._base(spark)
        out = pipeline.curate_strict(df)
        ids = sorted(r.doc_id for r in out.collect())
        # 1 survives; 2,3 collapse into 1; 4 is German; 5 fails gopher;
        # 6 fails the token floor
        assert ids == [1]

    def test_benchmark_decontam_stage(self, spark):
        pipeline, df = self._base(spark)
        bench = spark.createDataFrame(
            [(99, self.EN + " extra")], "doc_id bigint, text string"
        )
        out = pipeline.curate_strict(df, benchmark=bench, fuzzy_threshold=0.6)
        assert out.count() == 0  # the lone survivor matches the benchmark

    def test_classifier_floor(self, spark):
        pipeline, df = self._base(spark)
        out = pipeline.curate_strict(df, classifier_threshold=0.999)
        assert out.count() == 0


class TestTopNgramAggTwin:
    def test_equals_column_variant(self, spark, documents):
        col_out = {
            r.doc_id: r.f
            for r in documents.select(
                "doc_id", text.top_ngram_char_fraction("text", n=2).alias("f")
            ).collect()
        }
        agg_out = {
            r.doc_id: r.top_ngram_frac
            for r in text.top_ngram_char_fraction_agg(
                documents, "doc_id", "text", n=2
            ).collect()
        }
        assert col_out == agg_out

    def test_null_and_short(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, "one"), (3, "x y x y")], "id long, t string"
        )
        got = {
            r.id: r.top_ngram_frac
            for r in text.top_ngram_char_fraction_agg(df, "id", "t").collect()
        }
        # "x y x y": top bigram "x y" covers 2*2 of 4 token chars = 1.0
        assert got[1] is None and got[2] == 0.0 and got[3] == 1.0


class TestRandomProject:
    def test_matches_numpy_and_preserves_distance_roughly(self, spark, embeddings):
        import numpy as np

        emb = embeddings.filter(F.col("vec_id") < 50)
        out = {
            r.vec_id: r.p
            for r in emb.select(
                "vec_id",
                similarity.random_project("embedding", 64, 16, seed=3).alias("p"),
            ).collect()
        }
        raw = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
               for r in emb.collect()}
        R = np.asarray(similarity.projection_matrix(64, 16, 3))
        for vid, v in raw.items():
            assert np.allclose(out[vid], v @ R)
        # JL sanity: distances are preserved in scale (the synthetic
        # iid vectors have concentrated pairwise distances, so a
        # correlation test is ill-conditioned — check the mean ratio)
        ids = sorted(raw)[:20]
        orig = [np.linalg.norm(raw[a] - raw[b]) for a in ids for b in ids if a < b]
        proj = [
            np.linalg.norm(np.asarray(out[a]) - np.asarray(out[b]))
            for a in ids for b in ids if a < b
        ]
        ratio = np.mean(proj) / np.mean(orig)
        assert 0.6 < ratio < 1.4, ratio

    def test_deterministic_seeded(self, spark, embeddings):
        emb = embeddings.filter(F.col("vec_id") < 5)
        a = emb.select(similarity.random_project("embedding", 64, 8, seed=1).alias("p")).collect()
        b = emb.select(similarity.random_project("embedding", 64, 8, seed=1).alias("p")).collect()
        c = emb.select(similarity.random_project("embedding", 64, 8, seed=2).alias("p")).collect()
        assert a == b
        assert a != c


class TestHeavyHittersDifferential:
    def test_random_corpora_match_exact_under_guarantee(self, spark):
        import random
        from collections import Counter

        from datafusion_functions_json_spark.operators import sketch

        rng = random.Random(11)
        for trial in range(3):
            # zipf-ish draw over a 300-item universe
            items = [
                f"i{int(rng.paretovariate(1.2)) % 300:03d}"
                for _ in range(4000)
            ]
            truth = Counter(items)
            k = 8
            kth = sorted(truth.values(), reverse=True)[k - 1]
            # size capacity so the union guarantee covers the top-k
            capacity = max(len(items) // max(kth, 1) + 1, 2 * k)
            df = spark.createDataFrame(
                [(x,) for x in items], "item string"
            ).repartition(rng.randrange(2, 12))
            got = sketch.heavy_hitters(df, "item", k, capacity=capacity).collect()
            want = sorted(
                truth.items(), key=lambda kv: (-kv[1], kv[0])
            )[:k]
            assert [(r.item, r.cnt) for r in got] == want, trial


class TestDomainBlocklist:
    def test_suffix_and_exact_matching(self, spark):
        rows = [
            (1, "see https://spam.bad.example/x now"),
            (2, "see https://good.site.org/page ok"),
            (3, "see https://bad.example/y there"),
            (4, "visit https://sub.deep.bad.example/z too"),
            (5, "no urls at all here"),
            (6, "see https://notbad.example.com/q fine"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        bl = spark.createDataFrame([("bad.example",)], "domain string")
        kept = sorted(
            r.doc_id
            for r in text.filter_blocked_domains(
                df, "doc_id", "text", bl
            ).collect()
        )
        # 1/3/4 match bad.example (exact or parent); 6's host is
        # notbad.example.com — 'bad.example' is NOT one of its suffixes
        assert kept == [2, 5, 6]

    def test_suffix_expansion(self, spark):
        df = spark.createDataFrame([("a.b.c",)], "h string")
        got = df.select(text.domain_suffixes("h").alias("s")).collect()[0].s
        assert got == ["a.b.c", "b.c", "c"]

    def test_case_insensitive_blocklist(self, spark):
        df = spark.createDataFrame(
            [(1, "x https://CDN.Example.NET/a y")], "doc_id long, text string"
        )
        bl = spark.createDataFrame([("Example.net",)], "domain string")
        assert text.filter_blocked_domains(df, "doc_id", "text", bl).count() == 0


class TestRoundSixPlans:
    """Plan-shape pins for the round-6 operators: the quality gates stay
    shuffle-free scans, the join-based operators never plan a cartesian
    or an unbounded nested loop."""

    def test_quality_gates_no_exchange_no_python(self, documents):
        from datafusion_functions_json_spark.plans import explain_str

        df = documents.select(
            text.gopher_quality_flags("text").alias("g"),
            text.c4_clean("text").alias("c"),
            text.pretoken_count("text").alias("p"),
            text.normalize_text("text").alias("n"),
            text.quality_classifier_score("text").alias("q"),
            text.top_ngram_char_fraction("text").alias("t"),
        )
        plan = explain_str(df)
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_blocklist_no_nested_loop(self, spark, documents):
        from datafusion_functions_json_spark.plans import explain_str

        bl = spark.createDataFrame([("x.org",)], "domain string")
        plan = explain_str(
            text.filter_blocked_domains(documents, "doc_id", "text", bl)
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_semantic_dedup_pairs_keyed_not_bnlj(self, embeddings):
        from datafusion_functions_json_spark.plans import explain_str

        plan = explain_str(
            similarity.semantic_dedup(
                embeddings.filter(F.col("vec_id") < 30),
                "vec_id", "embedding", k=3, iters=1, threshold=0.9, salt="p",
            )
        )
        assert "CartesianProduct" not in plan
        # every BNLJ must be the bounded k-row centroid fan-out; the
        # round-11 cache contract (base persisted, dropped-ids eager)
        # prints the `base` subtree inside each InMemoryRelation child
        # as well as the live join branch, so the SAME centroid fan-out
        # appears several times in the text — the pairwise stage itself
        # is the cluster-keyed grouped-pandas Gram kernel (asserted
        # below), never a pair join, which is what this cap pins: the
        # count scales with printed base replicas (~2 BNLJ each), not
        # with candidate pairs
        assert plan.count("BroadcastNestedLoopJoin") <= 8
        assert "FlatMapGroupsInPandas" in plan
        import re as _re

        assert _re.search(r"hashpartitioning\(cluster", plan), plan

    def test_heavy_hitters_partial_topk_and_broadcast(self, spark):
        from datafusion_functions_json_spark.operators import sketch
        from datafusion_functions_json_spark.plans import explain_str

        df = spark.createDataFrame([("a",)] * 5, "item string")
        plan = explain_str(sketch.heavy_hitters(df, "item", 2, capacity=4))
        assert "TakeOrderedAndProject" in plan
        assert "BroadcastHashJoin" in plan  # candidates broadcast
        assert "CartesianProduct" not in plan

    def test_curriculum_no_single_partition_sort(self, spark):
        from datafusion_functions_json_spark.plans import explain_str

        df = spark.createDataFrame([(i, 0.5) for i in range(10)], "id long, s double")
        plan = explain_str(split.curriculum_rank(df, "id", "s", n_buckets=4))
        # the data-side window partitions by bucket; only the tiny
        # n_buckets-row offset table may see a singlePartition exchange
        data_side = plan.split("BroadcastExchange")[0]
        assert "Exchange SinglePartition" not in data_side


class TestSentences:
    def _s(self, spark, txt):
        df = spark.createDataFrame([(txt,)], "t string")
        return df.select(text.sentences("t").alias("s")).collect()[0].s

    def test_segmentation(self, spark):
        assert self._s(spark, "One. Two! Three? Four") == [
            "One.", "Two!", "Three?", "Four"
        ]
        assert self._s(spark, "No terminators at all") == [
            "No terminators at all"
        ]
        assert self._s(spark, "Wait... what?! Ok.") == [
            "Wait...", "what?!", "Ok."
        ]
        assert self._s(spark, "") == []
        df = spark.createDataFrame([(None,)], "t string")
        assert df.select(text.sentence_count("t").alias("n")).collect()[0].n is None


class TestCurateStrictMetrics:
    def test_stage_counts_ride_one_action(self, spark):
        from datafusion_functions_json_spark.operators import metrics, pipeline

        rows = [
            (1, "The quick brown fox jumps over the lazy dog to be of use "
                "and share that fine day with friends. " * 3),
            (2, "tiny"),
            (3, "der hund ist ein tier und das ist gut heute so " * 6),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stages = metrics.StageMetrics()
        out = pipeline.curate_strict(df, stages=stages)
        out.write.format("noop").mode("overwrite").save()  # ONE action
        rep = stages.report()
        assert rep["input"]["n_rows"] == 3
        assert rep["post_gates"]["n_rows"] == 1
        assert rep["post_dedup"]["n_rows"] == 1


class TestReviewFindingsRound7:
    """Regression pins for the round-7 adversarial review of
    dedup/similarity/text (each was a confirmed defect)."""

    def test_fuzzy_decontam_survives_id_collision(self, spark):
        # train id 7 is a near-copy of benchmark doc_id 7: the shared
        # numeric id must NOT suppress the contamination hit
        leak = (
            "the quick brown fox jumps over the lazy dog and shares a "
            "fine afternoon beside the quiet green river with friends"
        )
        clean = (
            "completely different prose about orbital mechanics and the "
            "slow drift of continents across geological ages of earth"
        )
        train = spark.createDataFrame(
            [(7, leak), (8, clean)], "doc_id long, text string"
        )
        bench = spark.createDataFrame([(7, leak)], "doc_id long, text string")
        out = dedup.fuzzy_decontaminate(
            train, "doc_id", "text", bench, threshold=0.7
        )
        assert [r.doc_id for r in out.collect()] == [8]

    def test_empty_docs_get_null_signatures_char_mode(self, spark):
        df = spark.createDataFrame(
            [("",), ("   ",), ("hello world",), (None,)], "t string"
        )
        for impl in ("pandas", "expr"):
            rows = df.select(
                dedup.minhash_signature("t", num_perm=8, impl=impl).alias("s")
            ).collect()
            # empty doc: NULL (was an identical real signature pre-fix)
            assert rows[0].s is None, impl
            assert rows[2].s is not None, impl
            assert rows[3].s is None, impl

    def test_word_expr_short_doc_null_matches_pandas(self, spark):
        df = spark.createDataFrame([("one two three",)], "t string")
        for impl in ("pandas", "expr"):
            row = df.select(
                dedup.minhash_signature(
                    "t", num_perm=8, mode="word", n=5, impl=impl
                ).alias("s")
            ).collect()[0]
            assert row.s is None, impl

    def test_null_embedding_rows_yield_null_not_crash(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        got = df.select(
            "vec_id",
            similarity.cosine_to_query_np("embedding", [1.0, 0.0]).alias("c"),
            similarity.pair_cosine_np("embedding", "embedding").alias("p"),
            similarity.random_project("embedding", 2, 2).alias("r"),
        ).orderBy("vec_id").collect()
        assert got[0].c == 1.0 and got[0].p == 1.0 and got[0].r is not None
        assert got[1].c is None and got[1].p is None and got[1].r is None
        top = similarity.cosine_topk(df, "embedding", [1.0, 0.0], k=2)
        assert [r.vec_id for r in top.collect()] == [1, 3]

    def test_simhash_block_validation(self, spark, documents):
        with pytest.raises(ValueError, match="divide 64"):
            dedup.simhash_dup_pairs(documents, "doc_id", "text", block_bits=24)
        with pytest.raises(ValueError, match="pigeonhole"):
            dedup.simhash_dup_pairs(
                documents, "doc_id", "text", max_hamming=4, block_bits=16
            )

    def test_minhash_dedup_validates_method_before_compute(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, text string").select(
            "id", F.assert_true(F.lit(False)).cast("string").alias("text")
        )
        # validation must fire BEFORE the LSH pipeline materializes —
        # with the poisoned column, computing anything would raise the
        # assert error instead of the argument error
        with pytest.raises(ValueError, match="unknown dedup method"):
            dedup.minhash_dedup(df, "id", "text", method="component")

    def test_ann_multiprobe_beyond_two(self, spark, embeddings):
        from __spark_entry__ import _query_vector

        q = _query_vector("/root/testdata/sf0.001")
        r2 = similarity.ann_topk(
            embeddings, "embedding", q, k=5, multiprobe=2
        ).collect()
        r3 = similarity.ann_topk(
            embeddings, "embedding", q, k=5, multiprobe=3
        ).collect()
        # distance<=3 probes a superset of distance<=2's buckets: the
        # candidate set can only grow, so top-5 cosine is >= pointwise
        assert len(r3) >= len(r2)
        if r2 and r3:
            assert r3[0].cosine >= r2[0].cosine
        with pytest.raises(ValueError, match="probes"):
            similarity.ann_topk(
                embeddings, "embedding", q, multiprobe=12, n_planes=20
            )

    def test_ivf_build_null_and_empty(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        assigned, cents = similarity.ivf_build(df, "embedding", 2, n_clusters=2)
        got = {r.vec_id: r.ivf_cluster for r in assigned.collect()}
        assert got[2] is None and got[1] is not None
        empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="no non-null vectors"):
            similarity.ivf_build(empty, "embedding", 2)

    def test_top_ngram_fraction_clamped(self, spark):
        df = spark.createDataFrame([(1, "a a a a a")], "id long, t string")
        frac = df.select(
            text.top_ngram_char_fraction("t", n=2).alias("f")
        ).collect()[0].f
        assert frac == 1.0  # was 1.6 pre-fix
        agg = text.top_ngram_char_fraction_agg(df, "id", "t", n=2).collect()[0]
        assert agg.top_ngram_frac == 1.0

    def test_normalize_keeps_accents_when_not_folding(self, spark):
        df = spark.createDataFrame([("Café au lait!",)], "t string")
        kept = df.select(
            text.normalize_text("t", strip_accents=False).alias("n")
        ).collect()[0].n
        assert kept == "café au lait"  # was 'caf au lait' pre-fix
        folded = df.select(text.normalize_text("t").alias("n")).collect()[0].n
        assert folded == "cafe au lait"


class TestReviewFindingsRound7b:
    """Regression pins for the second review batch
    (split/graph/pipeline/joins)."""

    def test_curate_strict_c4_columns_describe_returned_text(self, spark):
        good = (
            "This is a perfectly good long sentence line with the usual "
            "words to be of use and that will have weight.\n"
            "Another proper long sentence line sits right here to help!\n"
            "A third proper long sentence line finishes the document well.\n"
            "noise fragment with no terminal punctuation at all here"
        )
        df = spark.createDataFrame([(1, good)], "doc_id long, text string")
        from datafusion_functions_json_spark.operators import pipeline

        out = pipeline.curate_strict(
            df, min_tokens=5,
            gopher_kwargs=dict(min_words=5, min_required_stopwords=1),
            apply_c4=True,
        ).collect()
        assert len(out) == 1
        r = out[0]
        # the returned n_tokens must count the REWRITTEN text's tokens
        assert r.n_tokens == len(r.text.split())
        assert "noise fragment" not in r.text

    def test_connected_components_keeps_self_loop_vertices(self, spark):
        edges = spark.createDataFrame(
            [(5, 4), (4, 3), (3, 2), (2, 1), (10, 11), (7, 7)],
            "src long, dst long",
        )
        cc = {r.node: r.comp for r in graph.connected_components(edges).collect()}
        assert cc[7] == 7  # self-loop-only vertex: singleton component
        assert cc[5] == 1 and cc[10] == 10 and cc[11] == 10
        assert len(cc) == 8

    def test_connected_components_all_self_loops(self, spark):
        edges = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
        cc = {r.node: r.comp for r in graph.connected_components(edges).collect()}
        assert cc == {1: 1, 2: 2}

    def test_pagerank_results_unchanged_by_caching(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
        )
        ranks = {r.node: r.rank for r in graph.pagerank(edges, iters=5).collect()}
        assert abs(sum(ranks.values()) - 1.0) < 1e-4
        assert ranks[1] > ranks[4]  # 1 has in-links, 4 has none

    def test_salted_join_column_order_matches_plain(self, spark):
        from datafusion_functions_json_spark.operators import joins

        left = spark.createDataFrame([(10, 1)], "lid long, k long")
        right = spark.createDataFrame([(1, "x")], "k long, v string")
        plain = left.join(right, "k", "inner")
        salted = joins.salted_join(left, right, "k", salts=2, salt_on=["lid"])
        assert salted.columns == plain.columns  # key hoisted first

    def test_range_join_rejects_nonpositive_bucket(self, spark):
        from datafusion_functions_json_spark.operators import joins

        pts = spark.createDataFrame([(1, 5.0)], "id long, ts double")
        iv = spark.createDataFrame([(1, 0.0, 10.0)], "iid long, s double, e double")
        with pytest.raises(ValueError, match="bucket_seconds"):
            joins.range_join(pts, iv, "ts", "s", "e", ["iid"], bucket_seconds=0)

    def test_hash_split_rejects_out_of_range_fractions(self, spark, documents):
        with pytest.raises(ValueError, match=r"\[0, 1\]"):
            split.hash_split(documents, "doc_id", {"train": 1.5, "val": -0.5})

    def test_pack_batches_positions_share_assignment(self, spark, documents):
        from datafusion_functions_json_spark.operators import text as t

        base = documents.select(
            "doc_id", t.token_count("text").alias("nt")
        )
        b = split.pack_batches(base, "doc_id", "nt", budget=500, shards=4)
        p = split.pack_positions(base, "doc_id", "nt", budget=500, shards=4)
        bb = {r.doc_id: (r.shard, r.batch_id) for r in b.collect()}
        pp = {r.doc_id: (r.shard, r.batch_id) for r in p.collect()}
        assert bb == pp  # one shared prefix-sum core

    def test_curation_stats_single_job(self, spark, documents):
        from datafusion_functions_json_spark.operators import pipeline

        kept = documents.filter(F.col("doc_id") % 2 == 0)
        row = pipeline.curation_stats(documents, kept).collect()[0]
        assert row.n_in == documents.count()
        assert row.n_out == kept.count()
        assert 0 < row.survival_rate < 1

    def test_curation_stats_empty_input(self, spark, documents):
        # F.sum over zero rows is NULL — an empty docs frame must
        # still produce a (0, 0, 0.0) row, not a TypeError
        from datafusion_functions_json_spark.operators import pipeline

        empty = documents.filter(F.lit(False))
        row = pipeline.curation_stats(empty, empty).collect()[0]
        assert (row.n_in, row.n_out, row.survival_rate) == (0, 0, 0.0)
