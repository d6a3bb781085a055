"""Text / search stages: tokenization, inverted-index grouping, BM25
scoring family, n-gram counts, and training-data text analysis.

Reference mapping (SURVEY.md §2):
- tokenizer            -> M7 (indexer.go:787; regex lowercase split —
                          identical on index and query sides)
- postings pairs       -> M9/A1 SPIMI invert (indexer.go:672-768); the
                          sort-based groupby shuffle replaces spill
                          files + k-way heap merge (heap_merge.go:38-98)
- doc/field lengths    -> A3/A4 (indexer.go:620-632, 788-790)
- DF / TF              -> A8 (scoring.go:29-50)
- BM25F               -> Q5 (scoring.go:9-76; constants constant.go:28-39.
                          NOTE: the reference applies NAME_B to the
                          address field too — replicated for parity)
- BM25+               -> Q6 (scoring.go:143-181; the reference's
                          numerator is (K1+1)+tf, not (K1+1)*tf —
                          replicated for parity)
- TF-IDF dot product  -> Q7 (scoring.go:183-228; norms computed but
                          never divided by — replicated)
- n-gram counts        -> A5 (ngram_lm.go:112-210; n start + 1 end pad)
- vocab threshold      -> A6 (ngram_lm.go:56-110, COUNT_THRESOLD_NGRAM=2)
- quality / langid / token counting -> new training-data ops

All heavy paths are vectorized pandas/pyarrow inside map_batches with
partial (per-batch) aggregation before any groupby.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")

# BM25 constants (reference pkg/searcher/constant.go:28-39)
K1_BM25F = 10.0
NAME_WEIGHT = 20.0
ADDRESS_WEIGHT = 1.0
NAME_B = 0.95
ADDRESS_B = 0.3
DELTA = 1.0
K1 = 1.2
B = 0.98

START_TOKEN = "<s>"
END_TOKEN = "</s>"


def tokenize_series(texts: pd.Series) -> pd.Series:
    """lower + [a-z0-9]+ extraction; identical to the DuckDB oracle's
    regexp_extract_all(lower(text), '[a-z0-9]+')."""
    return texts.str.lower().str.findall(TOKEN_RE)


def split_fields(tokens: list[str], name_len: int = 3):
    """Two-field split for BM25F: name = first `name_len` tokens,
    address = the rest (documents have one text column; the reference's
    name/address pair is emulated deterministically)."""
    return tokens[:name_len], tokens[name_len:]


# ---------------------------------------------------------------------------
# postings / stats batch emitters (all return slim pair tables)


def postings_pairs(batch: pd.DataFrame, id_col="doc_id", text_col="text") -> pd.DataFrame:
    """(term, doc_id) DISTINCT pairs per doc — the SPIMI pair emission."""
    toks = tokenize_series(batch[text_col])
    out = (
        pd.DataFrame({"doc_id": batch[id_col], "term": toks})
        .explode("term")
        .dropna(subset=["term"])
        .drop_duplicates()
    )
    return out[["term", "doc_id"]].reset_index(drop=True)


def tf_pairs(batch: pd.DataFrame, id_col="doc_id", text_col="text") -> pd.DataFrame:
    """(term, doc_id, tf) rows."""
    toks = tokenize_series(batch[text_col])
    e = pd.DataFrame({"doc_id": batch[id_col], "term": toks}).explode("term").dropna(
        subset=["term"]
    )
    out = e.groupby(["term", "doc_id"], sort=False).size().reset_index(name="tf")
    out["tf"] = out["tf"].astype(np.int64)
    return out


def doc_lengths(batch: pd.DataFrame, id_col="doc_id", text_col="text") -> pd.DataFrame:
    toks = tokenize_series(batch[text_col])
    return pd.DataFrame(
        {"doc_id": batch[id_col], "n_tokens": toks.str.len().astype(np.int64)}
    )


def term_df(ds, id_col="doc_id", text_col="text", combine="driver"):
    """term -> document frequency.  Partial = per-batch distinct-doc
    counts per term (each doc lives in exactly one batch, so partial DFs
    sum exactly); final combine is tiny (bounded by vocab size)."""
    from .agg import two_phase_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        p = postings_pairs(batch, id_col, text_col)
        vc = p["term"].value_counts()
        return pd.DataFrame({"term": vc.index, "df": vc.to_numpy(np.int64)})

    return two_phase_agg(ds, partial, ["term"], ["df"], combine=combine)


def postings_lists(ds, id_col="doc_id", text_col="text"):
    """term -> sorted doc id list (the merged inverted index, A1+A2)."""

    def collect(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy())
        return pd.DataFrame({"term": [g["term"].iloc[0]], "postings": [ids.tolist()]})

    pairs = ds.map_batches(
        lambda b: postings_pairs(b, id_col, text_col), batch_format="pandas"
    )
    return pairs.groupby("term").map_groups(collect, batch_format="pandas")


# ---------------------------------------------------------------------------
# BM25F / BM25+ / TF-IDF scoring over a document Dataset for one query


def _collect_stats(ds, query_terms, id_col, text_col, name_len):
    """Pass 1: global stats — N, avg field lengths, df per query term.
    Everything is a partial-aggregated scan; results are tiny."""
    qset = sorted(set(query_terms))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        name_len_s = toks.str.len().clip(upper=name_len)
        addr_len_s = (toks.str.len() - name_len_s).clip(lower=0)
        rows = {"n_docs": [len(batch)],
                "sum_name_len": [int(name_len_s.sum())],
                "sum_addr_len": [int(addr_len_s.sum())]}
        for t in qset:
            rows[f"df__{t}"] = [int(toks.map(lambda ws: t in ws).sum())]
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    stats = parts.sum()
    n = float(stats["n_docs"])
    return {
        "N": n,
        "avg_name": float(stats["sum_name_len"]) / max(n, 1.0),
        "avg_addr": float(stats["sum_addr_len"]) / max(n, 1.0),
        "avg_doc": (float(stats["sum_name_len"]) + float(stats["sum_addr_len"]))
        / max(n, 1.0),
        "df": {t: float(stats[f"df__{t}"]) for t in qset},
    }


def bm25f_score(ds, query_terms: list[str], id_col="doc_id", text_col="text",
                name_len: int = 3):
    """Pass 2: per-doc BM25F score (reference scoring.go:29-76)."""
    stats = _collect_stats(ds, query_terms, id_col, text_col, name_len)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        names = toks.map(lambda ws: ws[:name_len])
        addrs = toks.map(lambda ws: ws[name_len:])
        s = np.zeros(len(batch))
        for t in query_terms:
            df = stats["df"][t]
            if df == 0:
                continue
            idf = np.log10(stats["N"] - df + 0.5) - np.log10(df + 0.5)
            tf_n = names.map(lambda ws: ws.count(t)).to_numpy(dtype=np.float64)
            tf_a = addrs.map(lambda ws: ws.count(t)).to_numpy(dtype=np.float64)
            ln = names.str.len().to_numpy(dtype=np.float64)
            la = addrs.str.len().to_numpy(dtype=np.float64)
            w_n = NAME_WEIGHT * (tf_n / (1 + NAME_B * (ln / stats["avg_name"] - 1)))
            # reference uses NAME_B for the address field too (scoring.go:60)
            w_a = ADDRESS_WEIGHT * np.where(
                la > 0, tf_a / (1 + NAME_B * (la / stats["avg_addr"] - 1)), 0.0
            )
            s += np.where(tf_n > 0, w_n / (K1_BM25F + w_n), 0.0) * idf
            s += np.where(tf_a > 0, w_a / (K1_BM25F + w_a), 0.0) * idf
        out = pd.DataFrame({"doc_id": batch[id_col], "score": s})
        return out[out["score"] != 0.0]

    return ds.map_batches(score, batch_format="pandas")


def bm25plus_score(ds, query_terms: list[str], id_col="doc_id", text_col="text"):
    """BM25+ (reference scoring.go:143-181, incl. its (K1+1)+tf numerator)."""
    stats = _collect_stats(ds, query_terms, id_col, text_col, name_len=0)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        dl = toks.str.len().to_numpy(dtype=np.float64)
        s = np.zeros(len(batch))
        for t in query_terms:
            df = stats["df"][t]
            if df == 0:
                continue
            idf = np.log10(stats["N"] + 1) - np.log10(df)
            tf = toks.map(lambda ws: ws.count(t)).to_numpy(dtype=np.float64)
            contrib = idf * (
                DELTA + ((K1 + 1) + tf) / (K1 * (1 - B + B * dl / stats["avg_doc"]) + tf)
            )
            s += np.where(tf > 0, contrib, 0.0)
        out = pd.DataFrame({"doc_id": batch[id_col], "score": s})
        return out[out["score"] != 0.0]

    return ds.map_batches(score, batch_format="pandas")


def tfidf_score(ds, query_terms: list[str], id_col="doc_id", text_col="text"):
    """TF-IDF dot product (reference scoring.go:183-228 — no norm
    division, replicated)."""
    stats = _collect_stats(ds, query_terms, id_col, text_col, name_len=0)
    q_count: dict[str, int] = {}
    for t in query_terms:
        q_count[t] = q_count.get(t, 0) + 1

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        s = np.zeros(len(batch))
        for t in sorted(set(query_terms)):  # deterministic FP sum order
            df = stats["df"][t]
            if df == 0:
                continue
            idf = np.log10(stats["N"]) - np.log10(df)
            tfq = (1 + np.log10(q_count[t])) * idf
            tf = toks.map(lambda ws: ws.count(t)).to_numpy(dtype=np.float64)
            with np.errstate(divide="ignore"):
                tfd = np.where(tf > 0, (1 + np.log10(np.maximum(tf, 1))) * idf, 0.0)
            s += tfd * tfq
        out = pd.DataFrame({"doc_id": batch[id_col], "score": s})
        return out[out["score"] != 0.0]

    return ds.map_batches(score, batch_format="pandas")


def top_k(score_ds, k: int, offset: int = 0):
    """Global top-k by (score desc, doc_id asc) — K1 page semantics."""
    df = (
        score_ds.sort(["score", "doc_id"], descending=[True, False])
        .limit(offset + k)
        .to_pandas()
    )
    out = df.iloc[offset : offset + k].reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


# ---------------------------------------------------------------------------
# n-gram counts (A5) — n start tokens + 1 end token (ngram_lm.go:373-384)


def ngram_pairs(batch: pd.DataFrame, n: int, id_col="doc_id", text_col="text",
                pad: bool = True) -> pd.DataFrame:
    toks = tokenize_series(batch[text_col])
    rows: dict[str, int] = {}
    for ws in toks:
        seq = ([START_TOKEN] * n + list(ws) + [END_TOKEN]) if pad else list(ws)
        for i in range(len(seq) - n + 1):
            g = " ".join(seq[i : i + n])
            rows[g] = rows.get(g, 0) + 1
    return pd.DataFrame(
        {"ngram": list(rows), "partial": np.fromiter(rows.values(), dtype=np.int64)}
    )


def ngram_counts(ds, n: int, id_col="doc_id", text_col="text", pad: bool = True,
                 combine="driver"):
    """Distributed n-gram counting: per-batch partial dict -> small sum
    (result bounded by distinct n-grams; see stages/agg.py)."""
    from .agg import two_phase_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        p = ngram_pairs(batch, n, id_col, text_col, pad)
        return p.rename(columns={"partial": "n"})

    return two_phase_agg(ds, partial, ["ngram"], ["n"], combine=combine)


def ngram_counts_multi(ds, n_max: int = 4, text_col="text", pad: bool = True,
                       combine="driver"):
    """All n-gram orders 1..n_max in ONE scan (the reference runs 4
    parallel goroutines over the same data, ngram_lm.go:345-370; one
    pass emitting (n, ngram) partials is strictly cheaper).  Returns
    {n: {ngram: count}} plus the total unigram mass."""
    from .agg import two_phase_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = tokenize_series(batch[text_col])
        rows: dict[tuple[int, str], int] = {}
        for ws in toks:
            base = list(ws)
            for n in range(1, n_max + 1):
                seq = ([START_TOKEN] * n + base + [END_TOKEN]) if pad else base
                for i in range(len(seq) - n + 1):
                    k = (n, " ".join(seq[i : i + n]))
                    rows[k] = rows.get(k, 0) + 1
        ns = np.fromiter((k[0] for k in rows), dtype=np.int64, count=len(rows))
        return pd.DataFrame(
            {"n_order": ns, "ngram": [k[1] for k in rows],
             "cnt": np.fromiter(rows.values(), dtype=np.int64, count=len(rows))}
        )

    out = two_phase_agg(ds, partial, ["n_order", "ngram"], ["cnt"],
                        combine=combine)
    if combine == "shuffle":
        out = out.to_pandas()
    counts: dict[int, dict[str, int]] = {n: {} for n in range(1, n_max + 1)}
    for r in out.itertuples():
        counts[int(r.n_order)][r.ngram] = int(r.cnt)
    total = sum(counts[1].values())
    return counts, total


def vocab_with_min_freq(ds, min_freq: int = 2, id_col="doc_id", text_col="text",
                        combine="driver"):
    """A6: terms with collection frequency >= min_freq (others -> <UNK>)."""
    from .agg import two_phase_agg

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        e = tokenize_series(batch[text_col]).explode().dropna()
        vc = e.value_counts()
        return pd.DataFrame({"term": vc.index, "freq": vc.to_numpy(np.int64)})

    counts = two_phase_agg(ds, partial, ["term"], ["freq"], combine=combine)
    if combine == "shuffle":
        return counts.filter(expr=f"freq >= {min_freq}")
    return counts[counts["freq"] >= min_freq].reset_index(drop=True)


# ---------------------------------------------------------------------------
# training-data text analysis (new ops)

STOPWORDS = {
    "en": ["the", "and", "of", "a", "to", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "ein", "mit", "von", "zu", "den"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "dans", "est"],
    "zh": ["de", "shi", "le", "zai", "you", "wo", "ta", "men", "zhe", "na"],
}


def quality_metrics(batch: pd.DataFrame, id_col="doc_id", text_col="text") -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality signals, mirrored in SQL."""
    text = batch[text_col]
    toks = tokenize_series(text)
    n_tokens = toks.str.len().astype(np.int64)
    n_chars = text.str.len().astype(np.int64)
    alnum_space = text.str.count(r"[a-zA-Z0-9 ]").astype(np.int64)
    en = set(STOPWORDS["en"])
    stop_hits = toks.map(lambda ws: sum(1 for w in ws if w in en)).astype(np.int64)
    return pd.DataFrame(
        {
            "doc_id": batch[id_col],
            "n_tokens": n_tokens,
            "n_chars": n_chars,
            "punct_ratio": np.round(
                1.0 - alnum_space / n_chars.clip(lower=1), 6
            ),
            "stopword_ratio": np.round(
                stop_hits / n_tokens.clip(lower=1).astype(np.float64), 6
            ),
            "mean_token_len": np.round(
                toks.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0),
                6,
            ),
        }
    )


def lang_id(batch: pd.DataFrame, id_col="doc_id", text_col="text") -> pd.DataFrame:
    """Stopword-list language id: argmax hits, ties -> lexicographic min."""
    toks = tokenize_series(batch[text_col])
    langs = sorted(STOPWORDS)
    sets = {l: set(STOPWORDS[l]) for l in langs}
    preds = []
    for ws in toks:
        hits = [(sum(1 for w in ws if w in sets[l]), l) for l in langs]
        best = max(hits, key=lambda p: (p[0], [-ord(c) for c in p[1]]))
        preds.append(best[1] if best[0] > 0 else "unknown")
    return pd.DataFrame({"doc_id": batch[id_col], "pred_lang": preds})


BPE_ISH_RE = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")


def token_counts(batch: pd.DataFrame, id_col="doc_id", text_col="text") -> pd.DataFrame:
    """Whitespace + BPE-ish regex token counts (training-data costing)."""
    text = batch[text_col]
    return pd.DataFrame(
        {
            "doc_id": batch[id_col],
            "ws_tokens": text.str.split().str.len().fillna(0).astype(np.int64),
            "bpe_ish_tokens": text.str.lower()
            .str.findall(BPE_ISH_RE)
            .str.len()
            .astype(np.int64),
        }
    )
