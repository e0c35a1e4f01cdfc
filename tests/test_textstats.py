"""Text-analysis operator tests: token counting, quality signals,
language ID, winnowing fingerprints."""

import pyarrow as pa

from scrape_ray.ops.textstats import (
    langid_vote,
    quality_stats,
    token_stats,
    winnow_fingerprint,
)


def _ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_token_stats(ray_session):
    out = (
        token_stats(_ds(["hello world", "a b  c", "", "x1y!"]))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "n_ws_tokens"] == 2
    assert out.loc[1, "n_ws_tokens"] == 3
    assert out.loc[2, "n_ws_tokens"] == 0
    # 'x1y!' → [x][1][y][!] = 4 bpe-ish tokens, 1 ws token
    assert out.loc[3, "n_bpe_tokens"] == 4
    assert out.loc[3, "n_ws_tokens"] == 1
    assert out.loc[0, "n_chars"] == 11


def test_quality_stats(ray_session):
    out = (
        quality_stats(_ds(["The cat, and the dog!", "xyz"]))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "n_punct"] == 2  # , !
    # whitespace tokens: The / cat, / and / the / dog! — exact-match
    # stopwords after casefold: The, and, the ⇒ 3
    assert out.loc[0, "n_stop_en"] == 3
    assert out.loc[1, "n_stop_en"] == 0


def test_quality_stats_exact(ray_session):
    out = quality_stats(_ds(["The and of to"])).to_pandas()
    assert out["n_stop_en"][0] == 4
    assert out["mean_word_len_x100"][0] == (3 + 3 + 2 + 2) * 100 // 4


def test_langid_vote():
    assert langid_vote("the cat and the dog is in that house with it") == "en"
    assert langid_vote("der hund und die katze ist nicht ein tier") == "de"
    assert langid_vote("le chat et la maison est dans les champs") == "fr"
    assert langid_vote("el perro es una casa en que los gatos") == "es"
    assert langid_vote("") == "und"
    assert langid_vote("zzz qqq www") == "und"


def test_fingerprint_equality_and_sensitivity():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    assert winnow_fingerprint(a) == winnow_fingerprint(a)
    assert winnow_fingerprint(a) != winnow_fingerprint(a + " extra")
    assert winnow_fingerprint("") == 0


def test_fingerprint_dataset(ray_session):
    from scrape_ray.ops.textstats import add_fingerprint

    texts = ["aa bb cc dd ee ff gg", "aa bb cc dd ee ff gg", "zz yy xx ww vv uu tt"]
    out = add_fingerprint(_ds(texts)).to_pandas()
    assert out["fingerprint"][0] == out["fingerprint"][1]
    assert out["fingerprint"][0] != out["fingerprint"][2]


def test_dedup_lines_semantics(ray_session):
    from scrape_ray.ops.textstats import dedup_lines

    texts = [
        "a\nb\na\nc\nb",          # dups of a and b removed, order kept
        "x\nx\nx",                # two dups
        "",                        # one empty line, no words
        "solo line no dups",
        "w w w w\nother",         # top word 'w' 4/5
    ]
    out = dedup_lines(_ds(texts)).to_pandas().sort_values("doc_id")
    assert list(out["clean_text"]) == [
        "a\nb\nc",
        "x",
        "",
        "solo line no dups",
        "w w w w\nother",
    ]
    assert list(out["n_lines"]) == [5, 3, 1, 1, 2]
    assert list(out["n_dup_lines"]) == [2, 2, 0, 0, 0]
    # Gopher top-word ratio: integer permille of most frequent token
    assert out["top_word_frac_x1000"].tolist()[4] == 4 * 1000 // 5
    assert out["top_word_frac_x1000"].tolist()[2] == 0


def test_term_frequencies_matches_counter(ray_session):
    from collections import Counter

    import ray.data

    from scrape_ray.ops.textstats import term_frequencies

    docs = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["a b b c", "b c d", "", "  a  a  ", "e", "\t\n"])]
    tf, df = Counter(), Counter()
    for d in docs:
        toks = d["text"].split()
        tf.update(toks)
        df.update(set(toks))
    got = (
        term_frequencies(ray.data.from_items(docs).repartition(4))
        .to_pandas().sort_values("token").reset_index(drop=True)
    )
    assert got["token"].tolist() == sorted(tf)
    assert got["tf"].tolist() == [tf[k] for k in sorted(tf)]
    assert got["df"].tolist() == [df[k] for k in sorted(df)]


def test_top_vocabulary_deterministic_tiebreak(ray_session):
    import ray.data

    from scrape_ray.ops.textstats import top_vocabulary

    # b and a tie on tf; 'a' must win the boundary slot alphabetically
    docs = [{"doc_id": 0, "text": "b a c c"}, {"doc_id": 1, "text": "a b c"}]
    v = top_vocabulary(ray.data.from_items(docs), k=2)
    assert v["token"].to_pylist() == ["c", "a"]


def test_vocab_coverage_counts_oov(ray_session):
    import ray.data

    from scrape_ray.ops.textstats import vocab_coverage

    docs = [
        {"doc_id": 0, "text": "in in out"},
        {"doc_id": 1, "text": ""},
        {"doc_id": 2, "text": "out out"},
    ]
    got = (
        vocab_coverage(ray.data.from_items(docs).repartition(3), ["in"])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["n_tokens"].tolist() == [3, 0, 2]
    assert got["n_oov"].tolist() == [1, 0, 2]


def test_ngram_frequencies_match_counter(ray_session):
    from collections import Counter

    import ray.data

    from scrape_ray.ops.textstats import term_frequencies

    docs = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["a b c a b", "b c", "x", "", "a"])]
    for n in (2, 3):
        tf, df = Counter(), Counter()
        for d in docs:
            toks = d["text"].split()
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
            tf.update(grams)
            df.update(set(grams))
        got = (
            term_frequencies(
                ray.data.from_items(docs).repartition(3), n=n)
            .to_pandas().sort_values("token").reset_index(drop=True)
        )
        assert got["token"].tolist() == sorted(tf)
        assert got["tf"].tolist() == [tf[k] for k in sorted(tf)]
        assert got["df"].tolist() == [df[k] for k in sorted(df)]


def test_winnow_batch_matches_scalar_across_shapes():
    """The vectorized whole-batch winnowing must equal the scalar
    reference row-for-row, across k/window shapes incl. window=1
    (the fingerprint_dups query's setting), docs shorter than k,
    duplicate grams and empty docs."""
    import random

    import numpy as np
    import pyarrow as pa

    from scrape_ray.ops.textstats import (
        _winnow_batch,
        _ws_tokens_flat,
        winnow_fingerprint,
    )

    random.seed(42)
    vocab = ["the", "cat", "dog", "und", "der", "le", "a", "b", "zz"]
    texts = ["", "one", "the the the the the the", "  pad  ed  "]
    for _ in range(300):
        n = random.randint(0, 25)
        texts.append(" ".join(random.choice(vocab) for _ in range(n)))
    t = pa.table({"text": pa.array(texts)})
    for k, w in [(5, 4), (5, 1), (2, 3), (1, 1), (3, 10)]:
        flat, parent = _ws_tokens_flat(t, "text")
        got = _winnow_batch(flat, parent, t.num_rows, k, w)
        want = np.array(
            [winnow_fingerprint(x, k, w) for x in texts], np.uint64)
        assert np.array_equal(got, want), (k, w)


def test_langid_dataset_matches_scalar(ray_session):
    import ray.data

    from scrape_ray.ops.textstats import add_langid, langid_vote

    texts = [
        "the cat and the dog is in that house with it",
        "der hund und die katze ist nicht ein tier",
        "le chat et la maison est dans les champs",
        "el perro es una casa en que los gatos",
        "", "zzz qqq www",
        "the der le el il",  # 1-way tie everywhere -> first lang (en)
    ]
    got = add_langid(
        ray.data.from_items([{"text": x} for x in texts])
    ).to_pandas()["lang_pred"].tolist()
    assert got == [langid_vote(x) for x in texts]


def test_tfidf_topk_hand_computed(ray_session):
    import ray.data

    from scrape_ray.ops.textstats import tfidf_topk

    docs = [
        {"doc_id": 0, "text": "apple apple banana"},
        {"doc_id": 1, "text": "banana cherry"},
        {"doc_id": 2, "text": ""},  # no tokens -> no rows
        {"doc_id": 3, "text": "cherry cherry cherry"},
    ]
    got = (
        tfidf_topk(ray.data.from_items(docs), k=2, scale=1000)
        .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
    )
    # N=4 docs; df: apple 1, banana 2, cherry 2
    # doc0: apple tf2/3 df1 -> 2*1000*4//(3*1)=2666; banana 1*4000//(3*2)=666
    # doc1: banana 1*4000//(2*2)=1000; cherry 1*4000//(2*2)=1000 (tie->banana)
    # doc3: cherry 3*4000//(3*2)=2000
    assert got["doc_id"].tolist() == [0, 0, 1, 1, 3]
    assert got["token"].tolist() == [
        "apple", "banana", "banana", "cherry", "cherry"]
    assert got["score_ppm"].tolist() == [2666, 666, 1000, 1000, 2000]
    assert got["rank"].tolist() == [1, 2, 1, 2, 1]


def test_tfidf_topk_layout_independent(ray_session):
    """The same corpus split into different block layouts must give
    identical top-k rows (per-doc work never crosses batches)."""
    import ray.data

    from scrape_ray.ops.textstats import tfidf_topk

    docs = [
        {"doc_id": i, "text": " ".join(
            ["tok%d" % (j % 7) for j in range(i % 11)])}
        for i in range(60)
    ]
    a = tfidf_topk(ray.data.from_items(docs).repartition(2)).to_pandas()
    b = tfidf_topk(ray.data.from_items(docs).repartition(13)).to_pandas()
    key = ["doc_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_dedup_lines_matches_scalar_reference(ray_session):
    """Vectorized line dedup vs a straightforward scalar replica,
    incl. empty text, newline-only text, all-duplicate docs."""
    from collections import Counter

    import ray.data

    from scrape_ray.ops.textstats import dedup_lines

    texts = [
        "", "\n", "\n\n", "a\na\na", "a\nb\na\nb", "x",
        "the the the\nthe the the", "one two\none two\nthree",
        "  \n  \npad", "tail\n",
    ]
    got = dedup_lines(
        ray.data.from_items([{"text": x} for x in texts])
    ).to_pandas().sort_index()
    for x, (_, row) in zip(texts, got.iterrows()):
        lines = x.split("\n")
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        words = x.split()
        assert row["clean_text"] == "\n".join(kept), x
        assert row["n_lines"] == len(lines), x
        assert row["n_dup_lines"] == len(lines) - len(kept), x
        want_tf = (Counter(words).most_common(1)[0][1] * 1000 // len(words)
                   if words else 0)
        assert row["top_word_frac_x1000"] == want_tf, x


def test_dup_span_stats_matches_bruteforce(ray_session):
    from collections import Counter

    from scrape_ray.ops.textstats import dup_span_stats

    texts = [
        "a b c d e f g h i j",       # head 8-gram shared with doc 1
        "a b c d e f g h x y",
        "short doc",                  # < n tokens -> 0 positions
        "z z z z z z z z z z z z",   # within-doc repeats count too
        "",
        "one two three four five six seven eight",  # exactly 1 position
    ]
    n = 8
    out = (
        dup_span_stats(_ds(texts), n=n, batch_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def grams(t):
        w = t.split()
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    c = Counter(g for t in texts for g in grams(t))
    for i, t in enumerate(texts):
        gs = grams(t)
        dp = sum(1 for g in gs if c[g] >= 2)
        row = out.iloc[i]
        assert row["n_pos"] == len(gs)
        assert row["dup_pos"] == dp
        assert row["dup_permille"] == ((dp * 1000) // len(gs) if gs else 0)


def test_dup_span_stats_layout_independent(ray_session):
    from scrape_ray.ops.textstats import dup_span_stats

    texts = [f"w{i} " * 3 + "p q r s t u v w x" for i in range(20)]
    a = (
        dup_span_stats(_ds(texts), n=8, batch_size=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dup_span_stats(_ds(texts).repartition(7), n=8, batch_size=20)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a["dup_pos"] > 0).all()  # the shared tail 8-grams repeat


def test_lm_rank_score_ranks_and_oov(ray_session):
    import ray.data

    from scrape_ray.ops.textstats import lm_rank_score

    # corpus: "a" x4, "b" x3, "c" x2, "rare" x1 -> ranks a=1 b=2 c=3
    # with vocab_k=3; "rare" is OOV and costs 4
    docs = ray.data.from_items([
        {"doc_id": 1, "text": "a a b c"},     # 1+1+2+3=7, 7*1000//4=1750
        {"doc_id": 2, "text": "a b b rare"},  # 1+2+2+4=9, 9*1000//4=2250
        {"doc_id": 3, "text": "a c"},         # 1+3=4 -> 2000
        {"doc_id": 4, "text": "   "},         # empty -> 0
    ]).repartition(3)
    got = {
        r["doc_id"]: r
        for r in lm_rank_score(docs, vocab_k=3).take_all()
    }
    assert got[1]["rank_sum"] == 7 and got[1]["score_permille"] == 1750
    assert got[2]["rank_sum"] == 9 and got[2]["score_permille"] == 2250
    assert got[3]["score_permille"] == 2000
    assert got[4]["n_tokens"] == 0 and got[4]["score_permille"] == 0


def test_lm_rank_score_tie_break_is_token_order(ray_session):
    import ray.data

    from scrape_ray.ops.textstats import lm_rank_score

    # "x" and "y" tie at 2 occurrences: rank by token text -> x=1 y=2
    docs = ray.data.from_items([
        {"doc_id": 1, "text": "x y"},
        {"doc_id": 2, "text": "y x"},
    ])
    got = {r["doc_id"]: r for r in
           lm_rank_score(docs, vocab_k=2).take_all()}
    assert got[1]["rank_sum"] == 3 == got[2]["rank_sum"]


def _brute_remove_dup_spans(texts, n=8):
    from collections import Counter

    grams = Counter()
    toks = {k: (t or "").split() for k, t in texts.items()}
    for w in toks.values():
        for i in range(len(w) - n + 1):
            grams[tuple(w[i:i + n])] += 1
    out = {}
    for k, w in toks.items():
        covered = [False] * len(w)
        for i in range(len(w) - n + 1):
            if grams[tuple(w[i:i + n])] >= 2:
                for j in range(i, i + n):
                    covered[j] = True
        kept = [t for t, c in zip(w, covered) if not c]
        out[k] = (" ".join(kept), len(w), len(w) - len(kept))
    return out


def test_remove_dup_spans_matches_brute_force(ray_session):
    import ray.data

    from scrape_ray.ops.textstats import remove_dup_spans

    texts = {
        1: "x a b c d e f g h y",
        2: "p q a b c d e f g h",
        3: "u v w x y z aa bb cc dd",
        4: "short doc",
        5: "a b c d e f g h a b c d e f g h",
        6: "",
        7: "r s t a b c d e f g h u v w",   # dup span mid-doc
    }
    want = _brute_remove_dup_spans(texts)
    for parts in (1, 4):
        ds = ray.data.from_items(
            [{"doc_id": k, "text": t} for k, t in texts.items()]
        ).repartition(parts)
        got = {r["doc_id"]: (r["clean_text"], r["n_tokens"],
                             r["n_removed"])
               for r in remove_dup_spans(ds).take_all()}
        assert got == want, parts


def test_dup_spans_shuffle_path_matches_broadcast(ray_session):
    """VERDICT r4 "Next #4": the sharded shuffle probe (dup set never
    broadcast) must be bit-identical to the broadcast path for BOTH
    ExactSubstr ops — forced three ways: dup_path="shuffle" directly,
    and an auto threshold (broadcast_max_hashes=1) the corpus's dup
    set exceeds."""
    import ray.data

    from scrape_ray.ops.textstats import dup_span_stats, remove_dup_spans

    texts = {
        1: "x a b c d e f g h y",
        2: "p q a b c d e f g h",
        3: "u v w x y z aa bb cc dd",
        4: "short doc",
        5: "a b c d e f g h a b c d e f g h",
        6: "",
        7: "r s t a b c d e f g h u v w",
        **{10 + i: f"w{i} " * 3 + "p q r s t u v w x" for i in range(12)},
    }
    ds = ray.data.from_items(
        [{"doc_id": k, "text": t} for k, t in texts.items()]
    ).repartition(5)

    for op in (dup_span_stats, remove_dup_spans):
        a = (op(ds, dup_path="broadcast").to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (op(ds, dup_path="shuffle").to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        c = (op(ds, broadcast_max_hashes=1).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        assert a.equals(b[a.columns]), op.__name__
        assert a.equals(c[a.columns]), op.__name__
        assert len(a) == len(texts)
    # brute-force ground truth through the shuffle path too
    want = _brute_remove_dup_spans(texts)
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
           for r in remove_dup_spans(ds, dup_path="shuffle").take_all()}
    assert got == want


def test_remove_dup_spans_small_n(ray_session):
    """n=2 bigram removal: overlapping dup spans merge."""
    import ray.data

    from scrape_ray.ops.textstats import remove_dup_spans

    texts = {1: "a b c a b", 2: "z b c z"}
    want = _brute_remove_dup_spans(texts, n=2)
    ds = ray.data.from_items(
        [{"doc_id": k, "text": t} for k, t in texts.items()])
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
           for r in remove_dup_spans(ds, n=2).take_all()}
    assert got == want
