"""Text analysis stages for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

All stateless vectorized map_batches transforms over the documents table
(doc_id, text, lang, source, n_chars). SQL-reproducible stats (token counts,
ratios, md5 fingerprints) are oracle-checked; the language-ID heuristic is
model-like (rows-only check + accuracy unit test).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import md5_hex

STOPWORDS = ["the", "a", "of", "and", "to"]


def token_stats(text_col: str = "text", id_col: str = "doc_id"):
    """Whitespace token count + char len + avg token length + stopword ratio.

    Token = ' '-separated piece (matches SQL len(string_split(text,' '))
    exactly, including empty pieces from double spaces)."""
    def fn(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        avg_len = pc.round(pc.divide(
            pc.cast(n_chars, pa.float64()), pc.cast(n_tokens, pa.float64())),
            ndigits=6, round_mode="half_towards_infinity")  # DuckDB ROUND
        # space-doubling trick: ' a a ' -> '  a  a  ' so token windows
        # ' a ' can never overlap — substring counting is then identical
        # across regex engines (RE2 vs DuckDB differ on overlap restarts)
        padded = pc.binary_join_element_wise(
            " ", pc.replace_substring(text, " ", "  "), " ", "")
        stop_hits = None
        for w in STOPWORDS:
            c = pc.count_substring(padded, f" {w} ")
            stop_hits = c if stop_hits is None else pc.add(stop_hits, c)
        stop_ratio = pc.round(pc.divide(
            pc.cast(stop_hits, pa.float64()), pc.cast(n_tokens, pa.float64())),
            round_mode="half_towards_infinity",
            ndigits=6)
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": n_tokens,
            "n_chars": n_chars,
            "avg_token_len": avg_len,
            "stopword_ratio": stop_ratio,
        })
    return fn


def fingerprint(text_col: str = "text", id_col: str = "doc_id"):
    """Document fingerprint: md5 of the lowercased, whitespace-normalized
    text (the content-defined identity used for exact dedup manifests)."""
    def fn(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.replace_substring_regex(text, r"\s+", " ")))
        return pa.table({
            id_col: batch[id_col],
            "fingerprint": md5_hex(norm),
        })
    return fn


# Tiny per-language marker lists for the n-gram/stopword language heuristic.
# Real pipelines plug a fasttext-style model into the same actor-pool slot.
LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "die", "und", "ist", "das"],
    "fr": ["le", "la", "et", "est", "les"],
    "es": ["el", "la", "y", "es", "los"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


class LanguageID:
    """Language-ID heuristic: score each language's marker-word hit rate,
    emit the argmax + a confidence ratio. State is a handful of regex
    strings — use as a plain map_batches callable (fuses with the read);
    reserve the actor-pool form (concurrency=...) for when a real model
    drops into this slot."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.patterns = {
            lang: "|".join(rf"(?:(?:^|\s){w}(?:\s|$))" for w in words)
            for lang, words in LANG_MARKERS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        text = batch[self.text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # marker words are lowercase; sentence-initial capitals (The, El,
        # Der...) are the single most common marker position, so match
        # case-insensitively via a lowercased view
        text = pc.utf8_lower(text)
        n = len(text)
        scores = np.zeros((len(self.patterns), n), np.float64)
        langs = list(self.patterns)
        for i, lang in enumerate(langs):
            c = pc.count_substring_regex(text, self.patterns[lang])
            scores[i] = c.to_numpy(zero_copy_only=False)
        best = scores.argmax(axis=0)
        total = scores.sum(axis=0)
        conf = np.where(total > 0, scores.max(axis=0) / np.maximum(total, 1e-9),
                        0.0)
        # dictionary take keeps the stage loop-free: names indexed by
        # argmax, rows with zero marker hits routed to the 'unknown' slot
        names = pa.array(langs + ["unknown"], pa.string())
        pred = pc.take(names, pa.array(
            np.where(total > 0, best, len(langs)), pa.int64()))
        return pa.table({
            self.id_col: batch[self.id_col],
            "lang_pred": pred,
            "lang_conf": pa.array(conf, pa.float64()),
        })
