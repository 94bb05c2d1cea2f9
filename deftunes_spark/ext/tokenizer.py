"""BPE tokenizer-vocabulary induction at corpus scale.

The classic byte-pair-encoding trainer (Sennrich et al., 2016 — the
algorithm behind GPT-2/RoBERTa-class vocabularies), shaped for Spark:

- **One pass over the corpus**, total: the text is only read to build
  the (word, freq) vocabulary table. At 100 TB that is the expensive
  step and it is a single tokenize + groupBy.
- **Iterations run on the vocab table, not the corpus.** Each merge
  round explodes the CURRENT symbol sequences of the distinct words
  (bounded by vocabulary size — millions of rows, not trillions),
  sums pair frequencies (map-side combined), takes the argmax with a
  deterministic tiebreak (freq desc, then lexicographic), and applies
  the merge with a per-row aggregate fold — no shuffle beyond the
  pair-count agg.
- **Applying** the trained merges to text is a per-token procedure
  with data-dependent iteration count — exactly the "Spark genuinely
  lacks the operator" case, so it runs as an Arrow-batched pandas UDF
  (`bpe_segment_udf`), merge table shipped in the closure.

Determinism: merge selection ties break on (-freq, left, right), so
the trained merge list is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deftunes_spark.ext.lineage import cut_lineage

# Marks end-of-word so merges never cross word boundaries; any
# non-corpus character works (standard BPE uses </w>).
EOW = "</w>"

# Byte-level mode (the production byte-fallback convention): each
# UTF-8 byte of a word becomes ONE latin-1 unit symbol
# (``word.encode('utf-8').decode('latin-1')``), so the base alphabet
# is the FIXED 256 latin-1 characters and NOTHING is ever OOV — no
# corpus alphabet scan, no n_unk. The end-of-word marker must then be
# a symbol no byte can produce: U+0100, the first codepoint past
# latin-1, can never collide with any byte sequence (the char-level
# path has to EXCLUDE documents containing its "</w>" literal; the
# byte path round-trips arbitrary text, markers included).
BYTE_EOW = "Ā"
BYTE_ALPHABET = [chr(i) for i in range(256)]


def _word_to_bytes(word: str) -> str:
    """UTF-8 bytes of ``word`` as a latin-1 string: one char per
    byte, the GPT-2-family byte-level representation that lets the
    whole char-level merge machinery run unchanged on bytes."""
    return word.encode("utf-8").decode("latin-1")


def word_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    lower: bool = True,
) -> DataFrame:
    """(word, freq) over whitespace tokens (lowercased by default —
    ``lower=False`` is the byte-level trainer's case-preserving mode)
    — the single full-corpus pass of BPE training."""
    base = F.trim(F.col(text_col))
    if lower:
        base = F.lower(base)
    toks = df.select(
        F.explode(
            F.filter(
                F.split(base, "[ \\t\\n\\x0B\\f\\r]+"),
                lambda t: t != "",
            )
        ).alias("word")
    )
    vocab = toks.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    if min_freq > 1:
        vocab = vocab.filter(F.col("freq") >= min_freq)
    return vocab


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """Round-0 BPE pair-frequency table: (p1, p2, n) over adjacent
    symbol pairs of the character-split vocabulary (end-of-word marker
    fused onto the last character). This is exactly the distributed
    aggregation ``bpe_train`` evaluates every merge round — exposed
    standalone so the engine's merge-selection algebra is value-hash
    checkable in SQL even though the iterated loop itself is not
    (``bpe_merges`` carries the rows-only check; this companion query
    carries the full oracle for the aggregation core).
    """
    vocab = word_vocab(df, text_col, min_freq)
    syms = (
        "concat(slice(split(word, ''), 1, length(word) - 1), "
        f"array(concat(element_at(split(word, ''), -1), {_sql_str(EOW)})))"
    )
    vsy = vocab.select(F.expr(syms).alias("syms"), "freq")
    return (
        vsy.filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(element_at(syms, i) AS p1, "
                    "element_at(syms, i + 1) AS p2))"
                )
            ).alias("p"),
        )
        .groupBy("p.p1", "p.p2")
        .agg(F.sum("freq").cast("bigint").alias("n"))
    )


def substring_seed_counts(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 8,
    min_freq: int = 1,
) -> DataFrame:
    """Unigram-LM seed-candidate table: every substring (length ≤
    ``max_piece_len``) of every vocabulary word, weighted by word
    frequency — the seeding pass of Kudo's unigram trainer
    (``unigram_train`` step 1), distributed instead of driver-local.
    On a 100 TB corpus this is the right home for the seed scan: one
    explode of codegen'd substring arrays plus one partial-aggregating
    groupBy, no Python in the loop. ``unigram_vocab`` stays rows-only
    (the EM loop is not SQL-expressible); this companion carries the
    full value-hash oracle for the seed algebra.
    """
    vocab = word_vocab(df, text_col, min_freq)
    subs = vocab.select(
        "freq",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                f"transform(sequence(i, least(i + {max_piece_len - 1}, "
                "length(word))), j -> substring(word, i, j - i + 1))))"
            )
        ).alias("piece"),
    )
    return subs.groupBy("piece").agg(
        F.sum("freq").cast("bigint").alias("piece_freq")
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(col: str, left: str, right: str) -> str:
    """Apply ONE merge rule to a symbol array: left-to-right fold that
    replaces each non-overlapping (left, right) adjacency with the
    concatenated symbol. Pure SQL aggregate — runs on every vocab row
    map-side."""
    a, b, ab = _sql_str(left), _sql_str(right), _sql_str(left + right)
    return (
        f"aggregate({col}, cast(array() as array<string>), "
        f"(acc, x) -> IF(size(acc) > 0 "
        f"AND element_at(acc, -1) = {a} AND x = {b}, "
        f"concat(slice(acc, 1, size(acc) - 1), array({ab})), "
        f"concat(acc, array(x))))"
    )


def _bpe_merge_loop_local(
    word_freqs: list[tuple[str, int]],
    num_merges: int,
    eow: str = EOW,
) -> list[tuple[str, str, int]]:
    """In-memory merge loop over a collected (word, freq) vocabulary.

    Incremental pair-count maintenance (the trick from Sennrich's
    reference subword-nmt trainer): a lazy max-heap of
    ``(-freq, left, right)`` entries plus an inverted index
    pair → {word ids}, so each merge round touches only the words
    containing the chosen pair and re-heapifies only the pairs whose
    counts changed — O(affected words) per round instead of
    O(vocabulary). A 32k-merge vocabulary runs in seconds where one
    Spark job per round would take hours of driver latency.

    Selection is EXACTLY the distributed rule: highest total
    frequency, ties broken lexicographically on (left, right); stop
    when the best pair's frequency drops below 2. Heap entries are
    validated against the live count on pop (lazy deletion), so
    stale entries never win.

    Unicode boundary: symbols here are Python code points while the
    distributed path splits on JVM UTF-16 code units — identical for
    BMP text (parity-tested); astral-plane characters differ in
    representation on the two paths.
    """
    import heapq
    from collections import Counter

    seqs: list[tuple[list[str], int]] = [
        (list(w[:-1]) + [w[-1] + eow], f) for w, f in word_freqs if w
    ]
    pair_counts: Counter = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, f) in enumerate(seqs):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-n, a, b) for (a, b), n in pair_counts.items()]
    heapq.heapify(heap)

    def _fold(syms: list[str], a: str, b: str) -> list[str]:
        out: list[str] = []
        ab = a + b
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = ab
            else:
                out.append(x)
        return out

    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges and heap:
        negn, a, b = heapq.heappop(heap)
        n = -negn
        if pair_counts.get((a, b), 0) != n:
            continue  # stale heap entry — count has changed since push
        if n < 2:
            break
        merges.append((a, b, n))
        changed: set[tuple[str, str]] = set()
        for wi in pair_words.pop((a, b), ()):
            syms, f = seqs[wi]
            new_syms = _fold(syms, a, b)
            if len(new_syms) == len(syms):
                continue  # inverted-index entry gone stale — no-op
            old_pairs = Counter(zip(syms, syms[1:]))
            new_pairs = Counter(zip(new_syms, new_syms[1:]))
            seqs[wi] = (new_syms, f)
            for p in old_pairs.keys() | new_pairs.keys():
                d = new_pairs[p] - old_pairs[p]
                if d:
                    pair_counts[p] += d * f
                    changed.add(p)
                if new_pairs[p]:
                    pair_words.setdefault(p, set()).add(wi)
        pair_counts.pop((a, b), None)
        changed.discard((a, b))
        for p in changed:
            c = pair_counts.get(p, 0)
            if c <= 0:
                pair_counts.pop(p, None)
                pair_words.pop(p, None)
            else:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    min_freq: int = 1,
    checkpoint_every: int = 4,
    reliable: bool = False,
    strategy: str = "auto",
    local_vocab_max: int = 5_000_000,
    byte_level: bool = False,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Returns [(left, right, pair_freq), ...] in merge order. Stops
    early when no pair repeats. ``reliable=`` selects the lineage-cut
    mode for the iterated vocab table (``ext.lineage``).

    ``strategy``: ``"local"`` collects the (word, freq) table once
    after the single corpus pass and runs the merge rounds in-memory
    (``_bpe_merge_loop_local``) — the merge loop is
    vocabulary-bounded, so this is almost always right even on a
    100 TB corpus; ``"distributed"`` iterates on the Spark vocab
    table (one job per round — only for vocabularies too large for
    the driver); ``"auto"`` picks local when the distinct-word count
    is at most ``local_vocab_max``. Both paths produce identical
    merges (parity-tested in tests/test_tokenizer.py).
    """
    if strategy not in ("auto", "local", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if byte_level and strategy == "distributed":
        # The distributed path's symbol-init expression splits JVM
        # strings per character; a byte split would need binary-typed
        # symbol arrays for no benefit — the merge loop is
        # VOCABULARY-bounded, so the local loop (over the collected
        # (word, freq) table produced by the one distributed corpus
        # pass) is the 100 TB path either way.
        raise ValueError(
            "byte_level BPE uses the local merge loop "
            "(strategy='local' or 'auto')"
        )
    # Byte level trains case-preserving (the production convention:
    # the tokenizer must round-trip arbitrary text, so no lossy
    # normalization is baked into the vocabulary).
    vocab = word_vocab(df, text_col, min_freq, lower=not byte_level)
    if strategy == "auto":
        # Bounded count decides the mode WITHOUT driver
        # materialization: limit(N+1).count() never moves more than a
        # scalar to the driver, so choosing "distributed" for an
        # over-threshold vocabulary can't OOM the very driver the
        # threshold protects (a probe-collect of N+1 Rows would).
        n_probe = vocab.limit(local_vocab_max + 1).count()
        if byte_level and n_probe > local_vocab_max:
            raise ValueError(
                "byte_level BPE: distinct-word vocabulary exceeds "
                f"local_vocab_max={local_vocab_max}; raise the cap "
                "or pre-truncate with min_freq"
            )
        strategy = (
            "local" if n_probe <= local_vocab_max else "distributed"
        )
        import logging

        logging.getLogger(__name__).info(
            "bpe_train: %s distinct words -> %s merge loop",
            n_probe if strategy == "local" else f">{local_vocab_max}",
            strategy,
        )
    if strategy == "local":
        word_freqs = [
            (r["word"], int(r["freq"])) for r in vocab.collect()
        ]
        if byte_level:
            word_freqs = [
                (_word_to_bytes(w), f) for w, f in word_freqs
            ]
            return _bpe_merge_loop_local(
                word_freqs, num_merges, eow=BYTE_EOW
            )
        return _bpe_merge_loop_local(word_freqs, num_merges)
    # Initial symbols: characters, with the end-of-word marker fused
    # onto the last character (standard BPE formulation).
    syms = (
        "concat(slice(split(word, ''), 1, length(word) - 1), "
        f"array(concat(element_at(split(word, ''), -1), {_sql_str(EOW)})))"
    )
    vocab = cut_lineage(
        vocab.select(F.expr(syms).alias("syms"), "freq"), reliable
    )

    merges: list[tuple[str, str, int]] = []
    for round_no in range(num_merges):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS p1, "
                        "element_at(syms, i + 1) AS p2))"
                    )
                ).alias("p"),
            )
            .groupBy("p.p1", "p.p2")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(
            F.col("n").desc(), F.col("p1"), F.col("p2")
        ).limit(1).collect()
        if not top or top[0]["n"] < 2:
            break
        left, right, n = top[0]["p1"], top[0]["p2"], int(top[0]["n"])
        merges.append((left, right, n))
        vocab = vocab.select(
            F.expr(_merge_expr("syms", left, right)).alias("syms"), "freq"
        )
        if (round_no + 1) % checkpoint_every == 0:
            vocab = cut_lineage(vocab, reliable)
    return merges


def _apply_merges(
    word: str,
    rules: list[tuple[str, str, str]],
    eow: str = EOW,
) -> list[str]:
    """Segment ONE word with the trained rules, applied sequentially
    in merge order with the same left-to-right non-overlapping fold
    the trainer uses — the shared kernel of ``bpe_segment_udf`` and
    ``bpe_encode`` (one definition, so the corpus-scale encode can
    never desync from the reference segmenter it is parity-tested
    against)."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + eow]
    for a, b, ab in rules:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == a and x == b:
                out[-1] = ab
            else:
                out.append(x)
        syms = out
    return syms


def corpus_alphabet(df: DataFrame, text_col: str = "text") -> list[str]:
    """Distinct characters of the lowercased corpus — ONE scan with a
    map-side-combined distinct whose output is bounded by the charset,
    not the corpus (the vocab/centroid bounded-pull pattern). Feeds
    the deterministic id table of :func:`bpe_encode`; pass it
    explicitly to encode new batches against a FIXED vocabulary."""
    rows = (
        df.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), "")
            ).alias("ch")
        )
        .filter(F.col("ch") != "")
        .distinct()
        .collect()
    )
    return sorted(r["ch"] for r in rows)


def bpe_vocab_ids(
    merges: list[tuple[str, str, int]],
    alphabet: list[str],
    eow: str = EOW,
) -> dict[str, int]:
    """Deterministic symbol → id table for a trained BPE: sorted base
    symbols first (each alphabet character plain and EOW-fused), then
    one symbol per merge IN MERGE ORDER — the GPT-2-family convention
    where an id beyond the base alphabet encodes merge rank. A pure
    function of (merges, alphabet): every executor, every batch, and
    every later ingest derives the same ids with no coordination."""
    ids: dict[str, int] = {}
    for c in sorted(set(alphabet)):
        for s in (c, c + eow):
            if s not in ids:
                ids[s] = len(ids)
    for a, b, _n in merges:
        s = a + b
        if s not in ids:
            ids[s] = len(ids)
    return ids


# Tokenization for encode: the repo-wide explicit whitespace class
# (never \s, never Python str.split()'s unicode set) — the same
# definition word_vocab trains on, mirrored by the DuckDB oracles.
_WS_RE = None  # compiled lazily inside workers


def _ws_tokens(text: str | None, lower: bool = True) -> list[str]:
    # Boundary whitespace is handled by split-then-filter, NOT
    # str.strip(): Python strip removes the full Unicode whitespace
    # set (NBSP, U+2028, ...) while the explicit class — and every
    # DuckDB oracle mirroring it — does not, so a window that starts
    # or ends with exotic whitespace would tokenize differently on
    # the two sides (r9 advice).
    global _WS_RE
    if _WS_RE is None:
        import re

        _WS_RE = re.compile("[ \t\n\x0B\f\r]+")
    s = text or ""
    if lower:
        s = s.lower()
    return [w for w in _WS_RE.split(s) if w != ""]


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    alphabet: list[str] | None = None,
    emit: str = "ids",
    byte_level: bool = False,
) -> DataFrame:
    """Distributed BPE APPLY — the hottest operator of a real
    pretraining ingest (every token of a 100 TB corpus flows through
    it): encode each document with a TRAINED merge table, one
    Arrow-batched ``mapInPandas`` stage, zero shuffle.

    The merge table and the id table are vocab-sized driver objects
    shipped in the task closure (the broadcast-small-model pattern
    ``image_phash`` proved); per-row work is pure local compute
    (explicit-whitespace-class word split → sequential merge fold →
    id lookup), so the stage rides the text scan and scales linearly
    in tokens with NO exchange. Ids come from :func:`bpe_vocab_ids`
    (pass ``alphabet`` to pin the vocabulary across batches — omitting
    it derives the alphabet from THIS corpus with one bounded-output
    scan); symbols outside the vocabulary encode as −1 and are counted
    in ``n_unk`` rather than silently dropped.

    ``emit='ids'`` → (id, token_ids array<int>, n_tokens, n_unk);
    ``emit='units'`` → (id, units array<string>, n_tokens, n_unk) —
    the subword strings themselves, whose concatenation reconstructs
    the normalized text exactly (EOW markers → word boundaries): the
    lossless-segmentation invariant the ``bpe_encode_roundtrip``
    oracle twin value-checks in SQL."""
    if emit not in ("ids", "units"):
        raise ValueError(f"unknown emit {emit!r}")
    import pandas as pd

    eow = BYTE_EOW if byte_level else EOW
    if byte_level:
        # Fixed 256-byte alphabet — no corpus scan, nothing OOV ever
        # (the byte-fallback property): every unit is either a base
        # byte symbol or a merge product, both in the id table, so
        # n_unk is structurally 0.
        alphabet = BYTE_ALPHABET
    elif alphabet is None:
        alphabet = corpus_alphabet(df, text_col)
    ids = bpe_vocab_ids(merges, alphabet, eow=eow)
    rules = [(a, b, a + b) for a, b, _n in merges]
    id_type = dict(df.dtypes)[id_col]
    out_field = (
        "token_ids array<int>" if emit == "ids"
        else "units array<string>"
    )
    schema = (
        f"{id_col} {id_type}, {out_field}, "
        "n_tokens bigint, n_unk bigint"
    )
    want_ids = emit == "ids"

    def _encode(batches):
        for pdf in batches:
            out_ids_col = []
            n_tok = []
            n_unk = []
            for t in pdf[text_col]:
                units: list[str] = []
                for w in _ws_tokens(t, lower=not byte_level):
                    if byte_level:
                        w = _word_to_bytes(w)
                    units.extend(_apply_merges(w, rules, eow=eow))
                if want_ids:
                    enc = [ids.get(u, -1) for u in units]
                    out_ids_col.append(enc)
                    n_unk.append(sum(1 for x in enc if x < 0))
                else:
                    out_ids_col.append(units)
                    n_unk.append(
                        sum(1 for u in units if u not in ids)
                    )
                n_tok.append(len(units))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    ("token_ids" if want_ids else "units"): out_ids_col,
                    "n_tokens": n_tok,
                    "n_unk": n_unk,
                }
            )

    return df.select(id_col, text_col).mapInPandas(_encode, schema)


def bpe_decode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    alphabet: list[str],
    ids_col: str = "token_ids",
    out_col: str = "decoded",
    unk: str = "�",
    byte_level: bool = False,
) -> DataFrame:
    """Inverse of :func:`bpe_encode`'s id mapping — ids → subword
    units via the same deterministic :func:`bpe_vocab_ids` table,
    concatenated with end-of-word markers restored to spaces. BPE
    segmentation is lossless, so ``decode(encode(x))`` equals the
    whitespace-normalized lowercased text — the full-oracle
    invariant the ``bpe_decode`` driver query value-checks in SQL
    (closing the tokenizer loop around the rows-only encode).

    The id → unit table is a literal ``map<int,string>`` column
    (vocab-sized: tiny at trained merge counts), so decode is a PURE
    CODEGEN PROJECTION — zero UDF, zero shuffle, rides whatever scan
    produced the ids. OOV ids (−1, or anything outside the table)
    decode to ``unk`` instead of vanishing, so the decoded text
    faithfully witnesses encode-side unknowns. For production-scale
    vocabularies (>~4k symbols) a map literal would bloat the
    codegen constant pool — ship the inverse dict in a mapInPandas
    closure instead (the :func:`bpe_encode` pattern); the id table
    derivation is shared either way."""
    eow = BYTE_EOW if byte_level else EOW
    if byte_level:
        alphabet = BYTE_ALPHABET
        if unk == "�":
            # Latin-1 bytes of UTF-8 U+FFFD: survives the byte→utf8
            # decode below as the replacement character itself.
            unk = "\xef\xbf\xbd"
    inv = {
        v: k
        for k, v in bpe_vocab_ids(merges, alphabet, eow=eow).items()
    }
    entries: list = []
    for i in sorted(inv):
        entries += [F.lit(i), F.lit(inv[i])]
    table = F.create_map(*entries)
    units = F.transform(
        F.col(ids_col),
        lambda x: F.coalesce(F.element_at(table, x), F.lit(unk)),
    )
    joined = F.rtrim(
        F.regexp_replace(F.array_join(units, ""), eow, " ")
    )
    if byte_level:
        # latin-1 byte symbols (+ the spaces the markers became) →
        # raw bytes → UTF-8 text. Both conversions are JVM built-ins,
        # so byte decode stays a pure codegen projection too.
        joined = F.decode(F.encode(joined, "ISO-8859-1"), "UTF-8")
    return df.withColumn(
        out_col,
        F.when(F.col(ids_col).isNotNull(), joined),
    )


def bpe_segment_udf(merges: list[tuple[str, str, int]]):
    """Arrow-batched subword segmentation with the trained merges,
    applied SEQUENTIALLY in merge order with the same left-to-right
    non-overlapping fold the trainer uses — so a word segments exactly
    as it did during training. Data-dependent iteration count → a
    vectorized UDF, not a column expression. Returns
    ``array<string>`` of subword units for a text column."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rules = [(a, b, a + b) for a, b, _n in merges]

    def _segment(texts):
        out = []
        for t in texts:
            units = []
            for w in _ws_tokens(t):
                units.extend(_apply_merges(w, rules))
            out.append(units)
        return pd.Series(out)

    # `from __future__ import annotations` stringifies inline hints,
    # which pandas_udf cannot resolve — attach real objects instead.
    _segment.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_segment, "array<string>")


# =====================================================================
# Unigram language-model tokenizer (Kudo 2018 — SentencePiece's
# second trainer family, complementing the BPE trainer above)
# =====================================================================


def _viterbi_segment(
    word: str, scores: dict[str, float], max_len: int
) -> list[str] | None:
    """Best segmentation of ``word`` into scored pieces (max log-prob
    sum); None when the word cannot be covered. Single characters not
    in the vocabulary are unreachable by construction — the trainer
    always retains all single characters, so training never strands a
    word."""
    n = len(word)
    best = [float("-inf")] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            s = scores.get(piece)
            if s is None or best[j] == float("-inf"):
                continue
            cand = best[j] + s
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    if best[n] == float("-inf"):
        return None
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 200,
    seed_size: int = 2000,
    max_piece_len: int = 8,
    n_em_rounds: int = 2,
    prune_frac: float = 0.2,
    min_freq: int = 1,
    local_vocab_max: int = 5_000_000,
) -> list[tuple[str, float]]:
    """Train a unigram-LM subword vocabulary (Kudo 2018) from the
    corpus; returns [(piece, log_prob)] sorted by piece.

    Spark shape — identical to ``bpe_train``'s split: the CORPUS sees
    exactly one distributed pass (the (word, freq) aggregation of
    ``word_vocab``); everything after runs on the vocabulary, which is
    driver-sized in practice, so seeding + EM + pruning are in-memory
    (``local_vocab_max`` guards the collect). At 100 TB the cost is
    the one tokenize+groupBy — the same envelope as BPE training.

    Algorithm (the standard formulation, deterministically tie-broken
    so the result is a pure function of the corpus):

    1. Seed: every substring of every word up to ``max_piece_len``,
       scored by total occurrence frequency; keep the ``seed_size``
       most frequent multi-char pieces plus ALL single characters
       (coverage guarantee).
    2. EM round: E — Viterbi-segment each distinct word under current
       piece log-probs, accumulating freq-weighted piece counts
       (hard-EM, the common practical simplification); M — piece
       log-prob = log(count / total), unused pieces floored to the
       smallest count.
    3. Prune: drop the ``prune_frac`` lowest-scoring prunable pieces
       (never single chars) per round until ``vocab_size`` remains,
       re-running EM after each prune so scores track the shrinking
       vocabulary.
    """
    import math
    from collections import Counter

    vocab_df = word_vocab(df, text_col, min_freq)
    # Bounded count BEFORE the collect, so an over-threshold
    # vocabulary raises without first materializing N+1 rows on the
    # driver (same probe discipline as bpe_train's auto mode).
    if vocab_df.limit(local_vocab_max + 1).count() > local_vocab_max:
        raise ValueError(
            "unigram_train: vocabulary exceeds local_vocab_max; raise "
            "the bound or pre-filter with min_freq"
        )
    rows = vocab_df.collect()
    word_freqs = sorted((r["word"], int(r["freq"])) for r in rows)

    # --- seed -------------------------------------------------------
    sub_freq: Counter = Counter()
    for w, f in word_freqs:
        n = len(w)
        for i in range(n):
            for l in range(1, min(max_piece_len, n - i) + 1):
                sub_freq[w[i : i + l]] += f
    singles = {p for p in sub_freq if len(p) == 1}
    multis = sorted(
        (p for p in sub_freq if len(p) > 1),
        key=lambda p: (-sub_freq[p], p),
    )[:seed_size]
    pieces = singles | set(multis)

    def em(pieces: set[str]) -> dict[str, float]:
        # Init scores from raw substring frequency, then hard-EM.
        total0 = sum(sub_freq[p] for p in pieces)
        scores = {
            p: math.log(sub_freq[p] / total0) for p in pieces
        }
        for _ in range(n_em_rounds):
            counts: Counter = Counter()
            for w, f in word_freqs:
                seg = _viterbi_segment(w, scores, max_piece_len)
                if seg is None:
                    continue
                for p in seg:
                    counts[p] += f
            total = sum(counts.values())
            if total == 0:
                return scores
            floor = 0.5  # unused pieces: below any used count
            scores = {
                p: math.log(max(counts.get(p, 0), floor) / total)
                for p in pieces
            }
        return scores

    scores = em(pieces)
    while len(pieces) > vocab_size:
        prunable = sorted(
            (p for p in pieces if len(p) > 1),
            key=lambda p: (scores[p], p),
        )
        if not prunable:
            break
        n_drop = max(1, int(len(pieces) * prune_frac))
        n_drop = min(n_drop, len(pieces) - vocab_size, len(prunable))
        pieces -= set(prunable[:n_drop])
        scores = em(pieces)
    return sorted((p, scores[p]) for p in pieces)


def _unigram_seg_word(
    word: str,
    scores: dict[str, float],
    max_piece_len: int,
    unk_score: float,
) -> list[str]:
    """Segment ONE word with a trained unigram vocabulary — the shared
    kernel of ``unigram_segment_udf`` and ``unigram_encode`` (one
    definition, the ``_apply_merges`` discipline, so the corpus-scale
    encode can never desync from the reference segmenter it is
    parity-tested against). Unknown characters are admitted as
    single-char fallback pieces scored below every vocabulary piece,
    so coverage is total and the Viterbi partition always
    reconstructs the word exactly."""
    if any(ch not in scores for ch in word):
        # Rare path: augment only for words with unknown chars —
        # the common case reuses the shared dict with no copy.
        aug = dict(scores)
        for ch in word:
            if ch not in aug:
                aug[ch] = unk_score
        return _viterbi_segment(word, aug, max_piece_len) or list(word)
    return _viterbi_segment(word, scores, max_piece_len) or list(word)


def unigram_segment_udf(
    vocab: list[tuple[str, float]], max_piece_len: int | None = None
):
    """Arrow-batched Viterbi segmentation with a trained unigram
    vocabulary — same justification as ``bpe_segment_udf``:
    data-dependent DP per token is the genuinely-not-a-column-
    expression case. Unknown characters surface as single-char
    fallback pieces so coverage is total. The DP span bound defaults
    to the vocabulary's own longest piece — passing a smaller value
    would silently make longer pieces unreachable. Tokenizes with the
    repo-wide explicit whitespace class (``_ws_tokens``), never
    Python ``str.split()``'s Unicode set — the r9-advice parity class
    that bit ``bpe_encode``'s strip."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    scores = dict(vocab)
    if max_piece_len is None:
        max_piece_len = max((len(p) for p in scores), default=1)
    unk = min(scores.values(), default=0.0) - 10.0

    def _segment(texts):
        out = []
        for t in texts:
            units: list[str] = []
            for w in _ws_tokens(t):
                units.extend(
                    _unigram_seg_word(w, scores, max_piece_len, unk)
                )
            out.append(units)
        return pd.Series(out)

    _segment.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_segment, "array<string>")


# SentencePiece's word-boundary marker (Kudo 2018): prefixed to each
# word-INITIAL piece at emission time — pieces themselves stay plain
# vocabulary members — so a flat unit stream round-trips to the
# normalized text by concat + marker→space. Any non-corpus character
# works; U+2581 is the published convention.
WORD_MARK = "▁"


def unigram_vocab_ids(vocab: list[tuple[str, float]]) -> dict[str, int]:
    """Deterministic piece → id table for a trained unigram
    vocabulary: each piece in sorted order gets TWO ids — the plain
    (word-internal) form and the :data:`WORD_MARK`-prefixed
    (word-initial) form, the SentencePiece convention that makes an
    id stream losslessly invertible (word boundaries live in the ids
    themselves, exactly as BPE's EOW-fused symbols do). A pure
    function of the vocabulary (scores don't participate), so every
    executor, batch, and later ingest derives the same ids with no
    coordination — the ``bpe_vocab_ids`` contract for the unigram
    family."""
    ids: dict[str, int] = {}
    for p in sorted({p for p, _s in vocab}):
        for s in (p, WORD_MARK + p):
            if s not in ids:
                ids[s] = len(ids)
    return ids


def unigram_encode(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    emit: str = "units",
    max_piece_len: int | None = None,
) -> DataFrame:
    """Distributed unigram-LM APPLY — the SentencePiece-family twin of
    :func:`bpe_encode`, completing the tokenizer loop for the second
    trainer: encode each document with a TRAINED unigram vocabulary in
    one Arrow-batched ``mapInPandas`` stage, zero shuffle, linear in
    tokens.

    The score and id tables are vocab-sized driver objects shipped in
    the task closure; per-row work is pure local compute
    (explicit-whitespace-class word split → per-word Viterbi DP →
    marker/id emission), so the stage rides the text scan with NO
    exchange — the same 100 TB shape as the BPE encode.

    ``emit='units'`` → (id, units array<string>, n_pieces, n_unk):
    the piece strings with :data:`WORD_MARK` prefixed to each
    word-initial piece, whose concatenation reconstructs the
    normalized text exactly (marker → space) — the lossless-coverage
    invariant the ``unigram_encode_roundtrip`` driver query
    value-checks in SQL. ``emit='ids'`` → (id, piece_ids array<int>,
    n_pieces, n_unk): the MARKED units through
    :func:`unigram_vocab_ids` (word-initial pieces get the marked
    id, so the id stream carries word boundaries and
    :func:`unigram_decode` inverts it losslessly); unknown-char
    fallback pieces outside the vocabulary encode as −1 and are
    counted in ``n_unk`` rather than silently dropped."""
    if emit not in ("ids", "units"):
        raise ValueError(f"unknown emit {emit!r}")
    import pandas as pd

    scores = dict(vocab)
    if max_piece_len is None:
        max_piece_len = max((len(p) for p in scores), default=1)
    unk_score = min(scores.values(), default=0.0) - 10.0
    ids = unigram_vocab_ids(vocab)
    id_type = dict(df.dtypes)[id_col]
    out_field = (
        "piece_ids array<int>" if emit == "ids"
        else "units array<string>"
    )
    schema = (
        f"{id_col} {id_type}, {out_field}, "
        "n_pieces bigint, n_unk bigint"
    )
    want_ids = emit == "ids"

    def _encode(batches):
        for pdf in batches:
            out_col = []
            n_pc = []
            n_unk = []
            for t in pdf[text_col]:
                units: list[str] = []
                for w in _ws_tokens(t):
                    seg = _unigram_seg_word(
                        w, scores, max_piece_len, unk_score
                    )
                    units.extend(
                        (WORD_MARK + p) if i == 0 else p
                        for i, p in enumerate(seg)
                    )
                if want_ids:
                    enc = [ids.get(u, -1) for u in units]
                    out_col.append(enc)
                    n_unk.append(sum(1 for x in enc if x < 0))
                else:
                    out_col.append(units)
                    n_unk.append(
                        sum(1 for u in units if u not in ids)
                    )
                n_pc.append(len(units))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    ("piece_ids" if want_ids else "units"): out_col,
                    "n_pieces": n_pc,
                    "n_unk": n_unk,
                }
            )

    return df.select(id_col, text_col).mapInPandas(_encode, schema)


def unigram_decode(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    ids_col: str = "piece_ids",
    out_col: str = "decoded",
    unk: str = "�",
) -> DataFrame:
    """Inverse of :func:`unigram_encode`'s id mapping — ids → pieces
    via the same deterministic :func:`unigram_vocab_ids` table
    (marked + plain forms), concatenated with word markers restored
    to spaces. The id stream carries word boundaries (word-initial
    pieces hold the marked ids), so ``decode(encode(x))`` equals the
    whitespace-normalized lowercased text whenever the vocabulary
    covers the corpus — which the trainer's retain-all-single-chars
    rule guarantees on its own training corpus: the full-oracle
    invariant the ``unigram_decode`` driver query value-checks in
    SQL (the ``bpe_decode`` bracket pattern for the second tokenizer
    family).

    Same shape as :func:`bpe_decode`: the inverse table is a literal
    ``map<int,string>`` column, so decode is a PURE CODEGEN
    PROJECTION — zero UDF, zero shuffle. OOV ids (−1, or anything
    outside the table) decode to ``unk`` instead of vanishing; a
    word-initial unknown swallows its boundary, faithfully
    witnessed rather than papered over (pytest-pinned). For
    production-scale vocabularies ship the inverse dict in a
    mapInPandas closure instead (the :func:`bpe_encode` pattern)."""
    inv = {v: k for k, v in unigram_vocab_ids(vocab).items()}
    entries: list = []
    for i in sorted(inv):
        entries += [F.lit(i), F.lit(inv[i])]
    table = F.create_map(*entries)
    pieces = F.transform(
        F.col(ids_col),
        lambda x: F.coalesce(F.element_at(table, x), F.lit(unk)),
    )
    return df.withColumn(
        out_col,
        F.when(
            F.col(ids_col).isNotNull(),
            F.trim(
                F.regexp_replace(
                    F.array_join(pieces, ""), WORD_MARK, " "
                )
            ),
        ),
    )
