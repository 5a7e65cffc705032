"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All stages are actor-pool ``map_batches`` classes (pattern/vocab setup
once per actor in ``__init__``) or stateless vectorized kernels. The
hot path is Arrow / pandas-str / numpy — no Python loop over rows
except where the kernel is inherently per-row (rolling hash), and that
is still a single C-backed pass via numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# character-frequency profiles for a tiny deterministic n-gram language
# heuristic (public-knowledge stopword/character cues, not a model)
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the ", " and ", " of ", " is ", " to "),
    "de": (" der ", " und ", " die ", " ist ", " das "),
    "fr": (" le ", " la ", " et ", " les ", " des "),
    "es": (" el ", " los ", " y ", " de la ", " que "),
    "zh": ("的", "是", "了", "在", "我"),
}


class LangId:
    """Heuristic n-gram language ID (actor-pool stage).

    Marker tables are built once per actor; scoring is vectorized
    ``str.count`` per marker (pandas → C). Returns ``lang_pred`` with
    the argmax marker density, 'und' when nothing matches."""

    def __init__(self):
        self.langs = list(_LANG_MARKERS)
        self.markers = _LANG_MARKERS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        padded = " " + text.str.lower() + " "
        scores = np.zeros((len(batch), len(self.langs)))
        for j, lang in enumerate(self.langs):
            for m in self.markers[lang]:
                scores[:, j] += padded.str.count(m, flags=0).to_numpy()
        best = scores.argmax(axis=1)
        pred = np.array(self.langs, dtype=object)[best]
        pred[scores.max(axis=1) == 0] = "und"
        batch["lang_pred"] = pred
        return batch


def token_stats(batch: pa.Table) -> pa.Table:
    """Whitespace tokenization stats, fully vectorized in Arrow:
    n_tokens (split on \\s+) and avg_token_len in exact integer
    micro-units (chars-sans-space * 10^6 // tokens) so the DuckDB
    oracle matches bit-for-bit."""
    import numpy as np

    text = batch.column("text")
    trimmed = pc.utf8_trim_whitespace(text)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    n_tokens = pc.list_value_length(toks).cast(pa.int64())
    no_space = pc.replace_substring_regex(trimmed, r"\s+", "")
    n_chars = pc.utf8_length(no_space).cast(pa.int64()).to_numpy(zero_copy_only=False)
    nt = n_tokens.to_numpy(zero_copy_only=False)
    avg_len = (n_chars * 1_000_000) // np.maximum(nt, 1)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": n_tokens,
            "avg_token_len": pa.array(avg_len, pa.int64()),
        }
    )


BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_stats(batch: pa.Table) -> pa.Table:
    """BPE-ish tokenization stats: alpha runs, digit runs and single
    punctuation marks as separate tokens (the word-boundary structure a
    byte-pair tokenizer sees). Pure Arrow ``count_substring_regex`` —
    RE2 on BOTH engines (pyarrow and DuckDB), so the oracle's
    ``regexp_extract_all`` lengths match exactly; no Python loop."""
    text = pc.fill_null(batch.column("text"), "")

    def n(pattern: str) -> pa.Array:
        return pc.count_substring_regex(text, pattern).cast(pa.int64())

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": n(BPE_PATTERN),
            "n_alpha_tokens": n(r"[A-Za-z]+"),
            "n_numeric_tokens": n(r"[0-9]+"),
            "n_other_tokens": n(r"[^A-Za-z0-9\s]"),
        }
    )


class QualityScore:
    """Quality heuristics per document (actor-pool stage): stopword
    ratio, mean word length, alpha ratio — the usual cheap pretraining
    filters. Stopword set + regex compiled once per actor."""

    def __init__(self):
        self.stop_arr = np.array(
            sorted("the and of a to in is it that for on with as are this".split()),
            dtype=object,
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from .hashing import segment_sums, split_flat

        flat, n = split_flat(batch["text"].str.lower())
        # flat word array + np.isin + per-doc reduceat — no per-row lambda
        n_stop = segment_sums(np.isin(flat, self.stop_arr), n)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n.astype("int64"),
                # exact integer micro-units: matches the oracle's // math
                "stopword_ratio": (n_stop * 1_000_000) // np.maximum(n, 1),
            }
        )
        return out


def fingerprint(batch: pa.Table, window: int = 8) -> pa.Table:
    """Document fingerprint, fully vectorized and SQL-oracle-checkable:

    - ``fingerprint`` — Horner polynomial hash mod 2^64 of the doc's
      unicode CODE POINTS (``acc = acc*B + cp``; DuckDB:
      ``list_reduce([unicode(c)::HUGEINT ...], ...)``);
    - ``min_window_hash`` — min Horner hash over sliding windows of
      ``window`` consecutive md5 WORD hashes (winnowing sketch; windows
      shrink to the doc length for short docs).

    No per-document Python loop: all docs' code points / word hashes are
    flattened once and every segment/window is evaluated with the
    modular prefix trick (functions/hashing.py)."""
    from .hashing import (
        codepoints_flat,
        horner_per_segment,
        md5_word_hashes,
        min_window_horner,
        split_flat,
        to_signed,
    )

    text = batch.column("text").to_pandas()
    cp, cp_lens = codepoints_flat(text)
    fps = horner_per_segment(cp, cp_lens)
    words, w_lens = split_flat(text)
    minh = min_window_horner(md5_word_hashes(words), w_lens, window=window)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(to_signed(fps), pa.int64()),
            "min_window_hash": pa.array(to_signed(minh), pa.int64()),
        }
    )


def corpus_freq_score(
    ds: ray.data.Dataset,
    vocab: str = "broadcast",
    top_k: int | None = None,
) -> ray.data.Dataset:
    """Two-pass GLOBAL-statistic scoring (the unigram-LM shape without
    float logs, so the oracle is bit-exact): pass 1 aggregates corpus
    token frequencies (partial pre-agg groupby — the shuffle carries one
    row per distinct token per block); pass 2 scores each doc with the
    MEAN corpus frequency of its tokens in exact integer micro-units
    (``Σfreq·10^6 // n``).

    ``vocab`` picks the pass-2 mechanism (all three produce the same
    schema; "broadcast" and "join" produce identical values):

    - ``"broadcast"`` — the whole frequency table rides ``ray.put``
      once. Exact; right while the vocabulary is Zipf-small relative
      to worker heap (holds far beyond these test scales, not at open
      web scale).
    - ``"join"`` — EXACT at any vocabulary size: (doc_id, token) rows
      hash-join the counts Dataset on the token, then a partial
      pre-agg groupby on doc_id sums frequencies; no driver- or
      worker-resident vocabulary anywhere.
    - ``"pruned"`` — broadcast only the ``top_k`` most frequent tokens
      (ties broken by token for determinism); tail tokens score as 0.
      APPROXIMATE by construction: a doc's score is understated by
      exactly its tail-token mass. The honest trade for web scale when
      the join's extra shuffle isn't worth it — Zipf means the top-K
      carries almost all token mass.

    High score = built from common tokens (boilerplate-ish); low score
    = rare vocabulary. The same two-pass plumbing carries a real LM."""
    import ray as _ray

    from .hashing import segment_sums, split_flat
    from .relational import grouped_agg

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        flat, _ = split_flat(batch["text"])
        return pd.DataFrame({"w": flat})

    counts_ds = grouped_agg(
        ds.map_batches(explode, batch_format="pandas"), ["w"], [("", "count", "c")]
    )

    if vocab == "join":
        return _corpus_freq_score_join(ds, counts_ds)

    counts = counts_ds.to_pandas()
    if vocab == "pruned":
        if top_k is None:
            raise ValueError("vocab='pruned' requires top_k")
        counts = counts.sort_values(
            ["c", "w"], ascending=[False, True], kind="stable"
        ).head(top_k)
    freq = dict(zip(counts["w"], counts["c"].astype("int64")))
    ref = _ray.put(freq)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        fr = _ray.get(ref)
        flat, lens = split_flat(batch["text"])
        if len(flat):
            # np.unique, not pd.factorize: the latter NUL-truncates keys
            vocab, codes = np.unique(flat, return_inverse=True)
            vf = np.fromiter((fr.get(w, 0) for w in vocab), dtype=np.int64, count=len(vocab))
            per_doc = segment_sums(vf[codes], lens)
        else:
            per_doc = np.zeros(len(lens), dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": lens.astype("int64"),
                "freq_score": (per_doc * 1_000_000) // np.maximum(lens, 1),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def _corpus_freq_score_join(
    ds: ray.data.Dataset, counts_ds: ray.data.Dataset
) -> ray.data.Dataset:
    """The no-resident-vocabulary pass 2: (doc_id, token) rows join the
    counts Dataset on the token (hash-partitioned), per-doc sums run as
    a partial pre-agg groupby, and zero-token docs re-enter via a left
    join of the doc-id spine. Exact at any vocabulary size."""
    from .hashing import split_flat
    from .relational import grouped_agg, hash_join

    def explode_with_id(batch: pd.DataFrame) -> pd.DataFrame:
        flat, lens = split_flat(batch["text"])
        return pd.DataFrame(
            {"doc_id": np.repeat(batch["doc_id"].to_numpy(), lens), "w": flat}
        )

    pairs = ds.map_batches(explode_with_id, batch_format="pandas")
    joined = hash_join(pairs, counts_ds, on="w")

    # per-doc sums through OUR exchange, not Ray's groupby().aggregate():
    # the latter emits zero-SCHEMA empty blocks (map_batches doesn't
    # visit empty blocks, so they can't be repaired downstream) which
    # acero rejects on the outer join below. The exchange yields only
    # non-empty schema'd buckets, and summed partials are their own
    # combiner, so receiver memory is O(distinct docs per bucket).
    from .relational import bucketed_group_map

    def to_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby("doc_id", sort=False)["c"]
            .agg(_fsum="sum", _n="count")
            .reset_index()
        )
        return g.astype({"_fsum": "int64", "_n": "int64"})

    def resum(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("doc_id", sort=False)[["_fsum", "_n"]].sum().reset_index()

    per_doc = bucketed_group_map(
        joined.map_batches(to_partial, batch_format="pandas"),
        ["doc_id"],
        resum,
        num_buckets=16,
        pre_reduce=resum,
    )

    spine = hash_join(
        ds.select_columns(["doc_id"]), per_doc, on="doc_id", join_type="left_outer"
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["_n"].fillna(0).to_numpy(dtype=np.int64)
        fsum = batch["_fsum"].fillna(0).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_tokens": n,
                "freq_score": (fsum * 1_000_000) // np.maximum(n, 1),
            }
        )

    return spine.map_batches(finish, batch_format="pandas")


def lang_id(ds: ray.data.Dataset, concurrency: int | None = None) -> ray.data.Dataset:
    if concurrency:
        return ds.map_batches(
            LangId, batch_format="pandas", concurrency=concurrency, batch_size=4096
        )
    from .dedup import _memoized

    return ds.map_batches(_memoized(LangId), batch_format="pandas", batch_size=4096)


def quality(ds: ray.data.Dataset, concurrency: int | None = None) -> ray.data.Dataset:
    if concurrency:
        return ds.map_batches(
            QualityScore, batch_format="pandas", concurrency=concurrency, batch_size=4096
        )
    from .dedup import _memoized

    return ds.map_batches(
        _memoized(QualityScore), batch_format="pandas", batch_size=4096
    )


def tfidf_top_term(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document most-characteristic term by TF·IDF, in exact
    integer micro-units so the DuckDB oracle is bit-for-bit:
    ``score = tf · (N·10^6 // df)`` with N = corpus size and df = the
    number of documents containing the term; ties broken by term
    (ascending) for determinism. Emits (doc_id, top_term, tfidf_score);
    zero-token docs emit ('', 0).

    Two-pass shape like ``corpus_freq_score``: pass 1 aggregates
    document frequencies with a partial pre-agg groupby over DISTINCT
    (doc, term) pairs (the shuffle carries one row per distinct term
    per block); pass 2 is batch-local — tf and the per-doc argmax need
    only the doc's own rows, so scoring adds NO shuffle. The df table
    rides ``ray.put`` once (Zipf-small vocabulary; at open-web scale
    substitute the join path exactly as in ``corpus_freq_score``)."""
    import ray as _ray

    from .hashing import split_flat
    from .relational import grouped_agg

    n_docs = ds.count()  # parquet-metadata fast path on a fresh read

    def explode_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        flat, lens = split_flat(batch["text"])
        d = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        if len(flat):
            # np.unique on (doc, token): string compare, no NUL pitfall
            key = pd.DataFrame({"d": d, "w": flat}).drop_duplicates()
            return pd.DataFrame({"w": key["w"].to_numpy()})
        return pd.DataFrame({"w": pd.Series([], dtype=object)})

    df_counts = grouped_agg(
        ds.map_batches(explode_distinct, batch_format="pandas"),
        ["w"],
        [("", "count", "df")],
    ).to_pandas()
    idf = dict(
        zip(
            df_counts["w"],
            (n_docs * 1_000_000) // df_counts["df"].to_numpy(dtype=np.int64),
        )
    )
    ref = _ray.put(idf)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        idf_map = _ray.get(ref)
        flat, lens = split_flat(batch["text"])
        out_term = np.full(len(batch), "", dtype=object)
        out_score = np.zeros(len(batch), dtype=np.int64)
        if len(flat):
            vocab, codes = np.unique(flat, return_inverse=True)
            iv = np.fromiter(
                (idf_map.get(w, 0) for w in vocab), dtype=np.int64, count=len(vocab)
            )
            d = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
            tf = (
                pd.DataFrame({"d": d, "c": codes})
                .groupby(["d", "c"], sort=False)
                .size()
                .reset_index(name="tf")
            )
            tf["score"] = tf["tf"].to_numpy(dtype=np.int64) * iv[tf["c"].to_numpy()]
            tf["term"] = vocab[tf["c"].to_numpy()]
            top = tf.sort_values(
                ["d", "score", "term"], ascending=[True, False, True], kind="mergesort"
            ).drop_duplicates("d")
            out_term[top["d"].to_numpy()] = top["term"].to_numpy()
            out_score[top["d"].to_numpy()] = top["score"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "top_term": out_term,
                "tfidf_score": out_score,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def repetition_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """Within-document repetition statistics — the Gopher-style
    repetition quality filters (duplicate-word fraction, most-frequent-
    word mass, duplicate-2-gram fraction), all in exact integer
    micro-units so the DuckDB oracle matches bit-for-bit:

    - ``dup_word_ratio``  = (n_tokens − distinct_tokens)·10^6 // n_tokens
    - ``top_word_ratio``  = max per-word count·10^6 // n_tokens
    - ``dup_2gram_ratio`` = (n_2grams − distinct_2grams)·10^6 // n_2grams

    Vectorized: one flat md5 word-hash array per batch (words are
    keyed by their 64-bit hash, not the string, to dodge the pandas
    hashtable NUL-truncation pitfall — exact modulo md5-64 collisions),
    per-(doc, word) counts via a C-backed two-key groupby, 2-grams as
    one shifted Horner combine over the flat hash array with
    cross-document windows masked out. High ratios = boilerplate /
    degenerate repetition; the usual drop thresholds are ~0.2–0.3.
    Reference analog: wprdc-etl has no corpus-quality layer; this
    extends pipeline/pipeline.py::Pipeline's per-record validation to
    corpus statistics."""
    from .hashing import HORNER_B, md5_word_hashes, split_flat

    flat, lens = split_flat(batch["text"])
    n_docs = len(batch)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    wh = md5_word_hashes(flat)

    n = lens.astype(np.int64)
    distinct = np.zeros(n_docs, dtype=np.int64)
    maxc = np.zeros(n_docs, dtype=np.int64)
    n2 = np.maximum(n - 1, 0)
    distinct2 = np.zeros(n_docs, dtype=np.int64)
    if len(flat):
        wc = (
            pd.DataFrame({"d": doc_idx, "h": wh})
            .groupby(["d", "h"], sort=False)
            .size()
            .reset_index(name="c")
        )
        per_doc = wc.groupby("d", sort=False)["c"].agg(["size", "max"])
        distinct[per_doc.index.to_numpy()] = per_doc["size"].to_numpy()
        maxc[per_doc.index.to_numpy()] = per_doc["max"].to_numpy()
        # 2-grams: Horner-combine adjacent word hashes; windows that
        # straddle a document boundary are masked out
        if len(flat) > 1:
            same = doc_idx[1:] == doc_idx[:-1]
            g = wh[:-1] * np.uint64(HORNER_B) + wh[1:]
            gc = (
                pd.DataFrame({"d": doc_idx[1:][same], "h": g[same]})
                .groupby(["d", "h"], sort=False)
                .size()
                .groupby(level=0, sort=False)
                .size()
            )
            distinct2[gc.index.to_numpy()] = gc.to_numpy()
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n,
            "dup_word_ratio": ((n - distinct) * 1_000_000) // np.maximum(n, 1),
            "top_word_ratio": (maxc * 1_000_000) // np.maximum(n, 1),
            "dup_2gram_ratio": ((n2 - distinct2) * 1_000_000) // np.maximum(n2, 1),
        }
    )


# ASCII case-fold pair for engine-agnostic lowercasing: Arrow's
# ascii_lower and DuckDB's translate(text, UPPER, lower) agree byte-for
# -byte on every input, including non-ASCII text (left untouched) —
# full-Unicode lower() implementations can differ between ICU versions,
# so the portable contract is ASCII-only folding.
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"

# redaction patterns (RE2-compatible: no backrefs/lookarounds — the
# same pattern string runs in Arrow's replace_substring_regex and
# DuckDB's regexp_replace) applied in list order
REDACT_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<email>"),
    (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<phone>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<ip>"),
    (r"\b\d{13,19}\b", "<longnum>"),  # card-length digit runs
]


def clean_text(batch: pa.Table, redact: bool = True) -> pa.Table:
    """Normalization + PII-style redaction for corpus preparation:
    redact emails / phone numbers / IPs / card-length digit runs, fold
    ASCII case, collapse whitespace runs to single spaces, trim. Pure
    Arrow kernels end-to-end (RE2 regexes, zero Python per row);
    redaction runs BEFORE case-folding so patterns see original text;
    pattern hits are counted on the ORIGINAL text (replacements apply
    sequentially in list order).

    Emits (doc_id, clean, n_redactions) — ``n_redactions`` is the
    vectorized ``count_substring_regex`` hit total, the quality signal
    used to drop PII-dense documents."""
    text = pc.fill_null(batch.column("text"), "")
    n_red = None
    if redact:
        for pat, _ in REDACT_PATTERNS:
            hits = pc.count_substring_regex(text, pat).cast(pa.int64())
            n_red = hits if n_red is None else pc.add(n_red, hits)
        for pat, repl in REDACT_PATTERNS:
            text = pc.replace_substring_regex(text, pat, repl)
    else:
        n_red = pa.array(np.zeros(batch.num_rows, np.int64))
    folded = pc.ascii_lower(text)
    collapsed = pc.replace_substring_regex(folded, r"\s+", " ")
    trimmed = pc.utf8_trim_whitespace(collapsed)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "clean": trimmed,
            "n_redactions": n_red,
        }
    )


def json_int_field(
    batch: pa.Table, col: str = "props", key: str = "k", out: str = "v"
) -> pa.Table:
    """Extract an integer field from a semi-structured JSON-string
    column, fully vectorized (Arrow RE2 ``extract_regex`` with a named
    group — no per-row json.loads). Missing/null/malformed rows yield
    NULL. The DuckDB oracle uses NATIVE ``json_extract``, so the two
    engines cross-check each other's parse. For nested/typed payloads
    swap the regex for a real JSON kernel at the same call site."""
    s = batch.column(col)
    m = pc.extract_regex(s, rf'"{key}":\s*(?P<v>-?\d+)')
    v = pc.if_else(pc.is_valid(m), pc.struct_field(m, "v"), None)
    return batch.append_column(out, v.cast(pa.int64()))
