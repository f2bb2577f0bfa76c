"""Byte-level BPE tokenizer: distributed training + zero-shuffle encode.

The Spark-first shape of BPE training (Sennrich et al. 2016; byte-level
base alphabet as in GPT-2) is NOT an iterative corpus scan — it is:

1. ONE distributed word-count: pre-tokenize with the same regex the
   text-stats operators use (``text.BPE_TOKEN_PATTERN``), explode,
   ``groupBy(word).count()`` — one shuffle whose output is bounded by
   the number of DISTINCT pre-tokens, not corpus size; ``min_count`` +
   ``max_words`` cap the table (the heavy tail carries ~all the mass,
   standard practice for corpus-scale tokenizer training).
2. An Arrow gather of that capped (word, count) table to the driver and
   the classic incremental merge loop over it — cost is
   O(words x merges) symbol work on a table of ~10^5-10^6 rows no
   matter whether the corpus is 1 GB or 100 TB.
3. ``encode`` as a broadcast of the merge ranks (8 bytes/merge) + one
   mapInArrow scan with a per-batch pre-token cache (natural text
   repeats pre-tokens heavily, so the merge loop runs once per DISTINCT
   pre-token per batch) — zero shuffle, the same scan shape as the
   other text operators.

Byte-level base alphabet: ids 0..255 are the raw bytes, id 256+i is
merge i, so ANY input round-trips exactly (no UNK, no normalization).
Determinism contract: the merge loop breaks count ties by the smallest
(left, right) id pair, and the word table is count-then-word ordered
before capping — two trains over the same corpus produce identical
merge tables (tested), and the serialized merge table IS the token-id
semantics (``BPT1`` magic; same treat-like-serialization rule as the
sketch-state magics — a different merge table reads another table's
token ids as garbage).

Reference parity note: the reference repo (thomasmueller/minperf) has
no tokenizer; this extends the LLM-pipeline surface (task brief: token
counting / text analysis) the same way ``text.py`` does.
"""

from __future__ import annotations

import re
import struct

import numpy as np
import pyarrow as pa

from .text import BPE_TOKEN_PATTERN

_HDR = struct.Struct("<4sI")
_MAGIC = b"BPT1"


def _merge_word(sym: list[int], a: int, b: int, new_id: int) -> list[int]:
    """One merge pass over a symbol list: every non-overlapping (a, b)
    occurrence (left-to-right) becomes new_id."""
    out = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _train_merges(words: list[bytes], counts: np.ndarray,
                  n_merges: int) -> np.ndarray:
    """Classic incremental BPE trainer over a (word, count) table.

    Keeps pair->total-count and pair->word-index maps updated as merges
    apply, so each round touches only the words containing the merged
    pair; the per-round argmax is a LAZY HEAP (entries are re-pushed on
    count change and validated against the live count on pop), so a
    round costs O(affected words + log P) rather than a scan of all
    live pairs — the difference between minutes and hours at the
    production point (32k merges over a ~10^6-word table). Tie-break:
    max count, then smallest (left, right) — a total order, hence
    deterministic; the heap ordering ((-count, pair)) realizes exactly
    that order."""
    import heapq

    syms: list[list[int]] = [list(w) for w in words]
    pair_counts: dict[tuple[int, int], int] = {}
    pair_words: dict[tuple[int, int], set[int]] = {}
    dirty: set[tuple[int, int]] = set()

    def _add(widx: int, sign: int) -> None:
        s, c = syms[widx], int(counts[widx]) * sign
        for j in range(len(s) - 1):
            p = (s[j], s[j + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            dirty.add(p)
            if sign > 0:
                pair_words.setdefault(p, set()).add(widx)

    for wi in range(len(syms)):
        _add(wi, +1)

    heap = [(-c, p) for p, c in pair_counts.items() if c > 0]
    heapq.heapify(heap)
    dirty.clear()

    merges = np.empty((n_merges, 2), dtype=np.int32)
    done = 0
    while done < n_merges and heap:
        negc, best = heapq.heappop(heap)
        live = pair_counts.get(best, 0)
        if live <= 0:
            continue  # exhausted pair, stale heap entry
        if -negc != live:
            heapq.heappush(heap, (-live, best))  # stale count: re-rank
            continue
        new_id = 256 + done
        merges[done] = best
        for wi in sorted(pair_words.get(best, ())):
            if best[0] not in syms[wi]:
                continue  # stale index from an earlier merge of this word
            _add(wi, -1)
            syms[wi] = _merge_word(syms[wi], best[0], best[1], new_id)
            _add(wi, +1)
        del pair_counts[best]
        pair_words.pop(best, None)
        # re-push every touched pair at its new count; pops validate
        # against pair_counts so superseded entries are skipped
        for p in dirty:
            c = pair_counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p))
        dirty.clear()
        done += 1
    return merges[:done]


def _ranks_of(merges) -> dict[tuple[int, int], int]:
    """merge table -> pair -> rank (shared by driver + executor paths)."""
    return {(int(a), int(b)): i for i, (a, b) in enumerate(merges)}


#: distinct-pretoken -> encoded-ids caches, one per merge table, kept for
#: the lifetime of a reused Python worker (spark.python.worker.reuse):
#: the merge loop for a given pre-token is a pure function of the merge
#: table, so encodes amortize across batches AND tasks. Keyed by the raw
#: merge-table bytes; entry count capped so a pathological corpus of
#: unique pre-tokens cannot grow worker memory unboundedly.
_ENCODE_CACHES: dict[bytes, dict[str, "np.ndarray"]] = {}
_ENCODE_CACHE_CAP = 1 << 20


def _worker_encode_cache(merges: "np.ndarray") -> dict[str, "np.ndarray"]:
    key = merges.tobytes()
    cache = _ENCODE_CACHES.get(key)
    if cache is None:
        _ENCODE_CACHES.clear()  # one live merge table per worker in practice
        cache = _ENCODE_CACHES.setdefault(key, {})
    return cache


def _vocab_of(merges) -> list[bytes]:
    """merge table -> id -> byte string (shared by driver + executor
    paths; ids 0..255 are the raw bytes, 256+i is merge i)."""
    out = [bytes([i]) for i in range(256)]
    for a, b in merges:
        out.append(out[int(a)] + out[int(b)])
    return out


def _decode_ids(vocab: list[bytes], ids) -> str:
    return b"".join(vocab[int(i)] for i in ids).decode("utf-8")


def _encode_token(b: bytes, ranks: dict[tuple[int, int], int]) -> list[int]:
    """GPT-2-style single-token encode: repeatedly merge the
    lowest-rank adjacent pair until none applies."""
    sym = list(b)
    while len(sym) > 1:
        best_rank, best_j = None, -1
        for j in range(len(sym) - 1):
            r = ranks.get((sym[j], sym[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        a, b2 = sym[best_j], sym[best_j + 1]
        sym = _merge_word(sym, a, b2, 256 + best_rank)
    return sym


class BPETokenizer:
    """A trained byte-level BPE tokenizer (see module docstring).

    ``vocab_size`` counts the 256 byte ids; ``merges`` is the ordered
    (left, right) id table, merge i producing id ``256 + i``."""

    def __init__(self, merges: np.ndarray):
        m = np.asarray(merges, dtype=np.int32)
        if m.ndim != 2 or m.shape[1] != 2:
            raise ValueError("merges must be an (n, 2) id table")
        self.merges = m

    # -- training ---------------------------------------------------------
    @classmethod
    def train(cls, df, text_col: str, vocab_size: int = 512,
              min_count: int = 1,
              max_words: int = 1_000_000) -> "BPETokenizer":
        """One word-count shuffle + a driver merge loop on the capped
        (word, count) table (Arrow gather — two columns, no Rows)."""
        from pyspark.sql import functions as F

        if vocab_size < 256:
            raise ValueError("vocab_size includes the 256 byte ids")
        toks = df.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0
                )
            ).alias("w")
        )
        wc = (
            toks.groupBy("w")
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") >= int(min_count))
            .orderBy(F.desc("c"), F.asc("w"))
            .limit(int(max_words))
        )
        tbl = wc.toArrow()
        words = [w.encode("utf-8") for w in tbl.column("w").to_pylist()]
        counts = tbl.column("c").to_numpy(zero_copy_only=False)
        merges = _train_merges(words, counts, vocab_size - 256)
        return cls(merges)

    # -- vocab ------------------------------------------------------------
    @property
    def vocab_size(self) -> int:
        return 256 + len(self.merges)

    def vocab(self) -> list[bytes]:
        """id -> byte string, ids 0..vocab_size-1."""
        return _vocab_of(self.merges)

    def _ranks(self) -> dict[tuple[int, int], int]:
        return _ranks_of(self.merges)

    # -- driver-side reference paths ---------------------------------------
    def encode_text(self, text: str) -> list[int]:
        ranks = self._ranks()
        out: list[int] = []
        for m in re.finditer(BPE_TOKEN_PATTERN, text):
            out.extend(_encode_token(m.group(0).encode("utf-8"), ranks))
        return out

    def decode_ids(self, ids) -> str:
        return _decode_ids(self.vocab(), ids)

    # -- distributed encode / decode ---------------------------------------
    def encode(self, df, text_col: str, out_col: str = "tokens"):
        """Add an ``array<int>`` token column. Pre-tokenization happens
        JVM-side (``regexp_extract_all`` — the SAME engine and pattern
        the training word-count used, so train and encode can never
        disagree on a token boundary, including the Java-vs-Python
        ``\\s`` unicode edge); the arrow_udf then merges each pre-token
        with a per-batch cache (the merge loop runs once per DISTINCT
        pre-token per batch — natural text repeats them heavily). Zero
        shuffle — broadcast ranks + one scan."""
        from pyspark.sql import functions as F
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import ArrayType, IntegerType

        sc = df.sparkSession.sparkContext
        bcast = sc.broadcast(self.merges)

        def _enc(col: pa.Array) -> pa.Array:
            # Vectorized batch encode (round 6): the old path called
            # row.as_py() per row — one Python str per pre-token
            # OCCURRENCE (millions per batch at sf1.0) plus a per-
            # occurrence dict probe and list.extend. Natural text repeats
            # pre-tokens heavily, so: dictionary-encode the flattened
            # pre-token column (pure Arrow), run the merge loop once per
            # DISTINCT pre-token (cached across batches per worker —
            # the merge table is immutable), and expand occurrence id
            # ranges with one numpy gather. Value-identical by
            # construction: same _encode_token per distinct, same
            # concatenation order.
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n_rows = len(col)
            row_pt_counts = (
                col.value_lengths()
                .fill_null(0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            denc = col.flatten().dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            distinct = denc.dictionary.to_pylist()
            cache = _worker_encode_cache(bcast.value)
            ranks = None
            enc: list[np.ndarray] = []
            for t in distinct:
                ids = cache.get(t)
                if ids is None:
                    if ranks is None:
                        ranks = _ranks_of(bcast.value)
                    ids = np.asarray(
                        _encode_token(t.encode("utf-8"), ranks),
                        dtype=np.int32,
                    )
                    if len(cache) < _ENCODE_CACHE_CAP:
                        cache[t] = ids
                enc.append(ids)
            lens_c = np.fromiter(
                (len(e) for e in enc), dtype=np.int64, count=len(enc)
            )
            starts_c = np.zeros(len(enc) + 1, dtype=np.int64)
            np.cumsum(lens_c, out=starts_c[1:])
            flat_ids = (
                np.concatenate(enc)
                if enc
                else np.empty(0, dtype=np.int32)
            )
            occ_lens = lens_c[codes]
            total = int(occ_lens.sum())
            seg = np.cumsum(occ_lens) - occ_lens
            local = np.arange(total, dtype=np.int64) - np.repeat(
                seg, occ_lens
            )
            out_vals = flat_ids[
                np.repeat(starts_c[codes], occ_lens) + local
            ]
            occ_cum = np.zeros(len(codes) + 1, dtype=np.int64)
            np.cumsum(occ_lens, out=occ_cum[1:])
            row_occ_off = np.zeros(n_rows + 1, dtype=np.int64)
            np.cumsum(row_pt_counts, out=row_occ_off[1:])
            offsets = occ_cum[row_occ_off]
            return pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32), type=pa.int32()),
                pa.array(out_vals, type=pa.int32()),
            )

        pretoks = F.regexp_extract_all(
            F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0
        )
        # parallelism floor (round 6): a single-row-group local input
        # otherwise serializes the encode kernel onto one task; at real
        # scale the input has >= cores partitions and the encode keeps
        # its zero-shuffle shape (session.ensure_min_partitions is a
        # provable no-op there; the plan test pins exactly that)
        from ..session import ensure_min_partitions

        df = ensure_min_partitions(df)
        # NULL text stays NULL (not a 0-token example): the when-guard
        # nulls the UDF result JVM-side, preserving null-ness through
        # the encode->decode round trip
        return df.withColumn(
            out_col,
            F.when(
                F.col(text_col).isNotNull(),
                arrow_udf(_enc, ArrayType(IntegerType()))(pretoks),
            ),
        )

    def decode(self, df, tokens_col: str, out_col: str = "text"):
        """Inverse scan: token ids -> UTF-8 text (broadcast id->bytes
        table; zero shuffle)."""
        from pyspark.sql.functions import arrow_udf
        from pyspark.sql.types import StringType

        sc = df.sparkSession.sparkContext
        bcast = sc.broadcast(self.vocab())

        def _dec(col: pa.Array) -> pa.Array:
            v = bcast.value
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out = []
            for row in col:
                ids = row.as_py()
                out.append(None if ids is None else _decode_ids(v, ids))
            return pa.array(out, type=pa.string())

        return df.withColumn(
            out_col, arrow_udf(_dec, StringType())(tokens_col)
        )

    # -- persistence --------------------------------------------------------
    def to_bytes(self) -> bytes:
        return _HDR.pack(_MAGIC, len(self.merges)) + np.ascontiguousarray(
            self.merges, dtype=np.int32
        ).tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BPETokenizer":
        magic, n = _HDR.unpack_from(data, 0)
        if magic != _MAGIC:
            raise ValueError(f"bad BPE tokenizer magic {magic!r}")
        body = np.frombuffer(data, dtype=np.int32, offset=_HDR.size)
        if body.size != n * 2:
            raise ValueError("BPE tokenizer byte length does not match header")
        return cls(body.reshape(n, 2).copy())
