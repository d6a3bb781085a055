"""Corpus-scale 4-gram language-model familiarity scoring.

The reference trains a 4-gram LM (ngram_lm.go:105-210) and scores
QUERIES with stupid backoff (ngram_lm.go:301-342) inside one process.
A training-data pipeline needs the same model turned around: score
every DOCUMENT of the corpus by how familiar its n-grams are (the
CCNet-style LM quality gate, Wenzek et al. 2020) — at corpus scale,
with the count tables staying distributed.

Integer-exact design (the repo's oracle rule): instead of float
perplexity, each scored position reports its BACKOFF LEVEL — the
longest n (4, 3, 2, 1) whose n-gram occurs >= `min_count` times in
the corpus (min_count=2 so a doc's own singleton n-grams don't
trivially match).  Per-doc output: n_pos + level histogram
(l4, l3, l2, l1) — all integers; the float stupid-backoff score is a
deterministic function of these counts plus the count tables and is
exercised in pytest, not the oracle.

Scale shape:
  1. one corpus scan explodes every padded token stream to window
     rows (doc_id, pos, g4, g3, g2) — vectorized shifts, no per-row
     Python — materialized once (four consumers);
  2. count tables F4/F3/F2 = two_phase_agg over the window rows,
     filtered to count >= min_count (much smaller than raw counts);
  3. three hash LEFT JOINs (positions x Fn on the n-gram string —
     exact string membership, J4's term->postings shape) assign
     levels; per-doc histogram = one two_phase_agg.
  The OOV->'<unk>' dictionary is the bounded vocab artifact
  (vocab >= min_freq, A6/S15) broadcast sorted; swap to a keyed join
  when the dictionary itself outgrows broadcast.

Padding: one shared stream ['<s>']*3 + tokens + ['</s>'] per doc;
count tables for every order are windows over this same stream
(engine-canonical: one padded stream for all orders, mirrored in the
SQL oracle)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import text
from .agg import default_join_partitions, ensure_schema, join_safe, two_phase_agg

PAD = "<s>"
EOS = "</s>"
UNK = "<unk>"


def window_rows(ds, vocab_sorted: np.ndarray, id_col: str = "doc_id",
                text_col: str = "text"):
    """Corpus -> (doc_id, pos, g4, g3, g2) window rows over the padded
    UNK-replaced stream; pos is 1-based in the padded stream, and a
    row at pos p carries the n-gram ENDING at p (valid when p >= n)."""

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        toks = text.tokenize_series(b[text_col])
        ids = b[id_col].to_numpy(np.int64)
        flat, doc, lens = [], [], toks.str.len().to_numpy(np.int64)
        for i, ws in enumerate(toks):
            flat.extend([PAD, PAD, PAD])
            flat.extend(ws)
            flat.append(EOS)
        if not flat:
            return pd.DataFrame({
                id_col: pd.Series([], dtype=np.int64),
                "pos": pd.Series([], dtype=np.int64),
                "g4": pd.Series([], dtype=str),
                "g3": pd.Series([], dtype=str),
                "g2": pd.Series([], dtype=str)})
        tok = pd.Series(flat, dtype=object)
        # OOV -> <unk> (meta tokens are never in the alnum vocab but
        # must stay themselves)
        v = tok.to_numpy()
        meta = (v == PAD) | (v == EOS)
        ix = np.searchsorted(vocab_sorted, v)
        ix[ix >= len(vocab_sorted)] = 0
        known = (vocab_sorted[ix] == v) if len(vocab_sorted) else \
            np.zeros(len(v), dtype=bool)
        tok = pd.Series(np.where(meta | known, v, UNK), dtype=object)

        stream_len = lens + 4
        doc = np.repeat(ids, stream_len)
        pos = np.concatenate([np.arange(1, sl + 1) for sl in stream_len])
        l1, l2, l3 = tok.shift(1), tok.shift(2), tok.shift(3)
        sep = " "
        g2 = l1.str.cat(tok, sep=sep)
        g3 = l2.str.cat(g2, sep=sep)
        g4 = l3.str.cat(g3, sep=sep)
        out = pd.DataFrame({id_col: doc, "pos": pos,
                            "g4": g4.fillna(""), "g3": g3.fillna(""),
                            "g2": g2.fillna("")})
        return out[out["pos"] >= 2]  # pos 1 contributes to no window

    return ds.map_batches(explode, batch_format="pandas")


def _freq_set(win_ds, col: str, min_pos: int, min_count: int, flag: str):
    """n-grams of one order with corpus count >= min_count, as a join
    side (ngram, flag=1)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.loc[b["pos"] >= min_pos, [col]]
        vc = g.groupby(col, sort=False, as_index=False).size()
        return vc.rename(columns={"size": "cnt", col: "g"})

    counts = two_phase_agg(win_ds, partial, ["g"], ["cnt"])

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        k = b.loc[b["cnt"] >= min_count, ["g"]].copy()
        k[flag] = np.int64(1)
        return k.rename(columns={"g": col})

    return ensure_schema(
        counts.map_batches(keep, batch_format="pandas"),
        {col: str, flag: np.int64})


def backoff_stats(ds, id_col: str = "doc_id", text_col: str = "text",
                  min_vocab_freq: int = 2, min_count: int = 2):
    """Per-document backoff-level histogram (see module docstring).
    Returns a Dataset (doc_id, n_pos, l4, l3, l2, l1)."""
    vdf = text.vocab_with_min_freq(
        ds, min_vocab_freq, id_col=id_col, text_col=text_col).to_pandas()
    vocab_sorted = np.sort(vdf["term"].to_numpy(dtype=object))

    win = window_rows(ds, vocab_sorted, id_col, text_col).materialize()

    # an n-gram window ENDS at pos p when p >= n (stream pads 3 x <s>)
    f4 = _freq_set(win, "g4", 4, min_count, "hit4")
    f3 = _freq_set(win, "g3", 3, min_count, "hit3")
    f2 = _freq_set(win, "g2", 2, min_count, "hit2")

    def pos_rows(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["pos"] >= 4, [id_col, "g4", "g3", "g2"]]

    n_part = default_join_partitions()
    pos = win.map_batches(pos_rows, batch_format="pandas")
    j = pos.join(join_safe(f4, n_part), "left_outer", n_part, on=("g4",))
    j = j.join(join_safe(f3, n_part), "left_outer", n_part, on=("g3",))
    j = j.join(join_safe(f2, n_part), "left_outer", n_part, on=("g2",))

    def level_partial(b: pd.DataFrame) -> pd.DataFrame:
        h4 = b["hit4"].notna().to_numpy()
        h3 = b["hit3"].notna().to_numpy() & ~h4
        h2 = b["hit2"].notna().to_numpy() & ~h4 & ~b["hit3"].notna().to_numpy()
        h1 = ~(h4 | h3 | h2)
        d = pd.DataFrame({id_col: b[id_col].to_numpy(np.int64),
                          "n_pos": np.int64(1),
                          "l4": h4.astype(np.int64),
                          "l3": h3.astype(np.int64),
                          "l2": h2.astype(np.int64),
                          "l1": h1.astype(np.int64)})
        return d.groupby(id_col, sort=False, as_index=False).sum()

    return two_phase_agg(j, level_partial, [id_col],
                         ["n_pos", "l4", "l3", "l2", "l1"])


def stupid_backoff_doc_score(tokens: list[str], counts: dict[int, dict],
                             total_words: int, lam: float = 0.4) -> float:
    """Reference stupid-backoff (ngram_lm.go:301-342) summed over a
    padded document stream — the float score the integer histogram
    underpins; used by tests, not the oracle."""
    import math

    seq = [PAD] * 3 + tokens + [EOS]
    s = 0.0
    for i in range(3, len(seq)):
        score, k = None, 4
        mult = 1.0
        while k >= 1:
            g = " ".join(seq[i - k + 1:i + 1])
            c = counts[k].get(g, 0)
            if c > 0:
                if k == 1:
                    score = mult * c / total_words
                else:
                    prev = " ".join(seq[i - k + 1:i])
                    cp = counts[k - 1].get(prev, 0)
                    if cp > 0:
                        score = mult * c / cp
                    else:
                        k -= 1
                        mult *= lam
                        continue
                break
            k -= 1
            mult *= lam
        s += math.log(score) if score else math.log(lam ** 3 / max(total_words, 1))
    return s
