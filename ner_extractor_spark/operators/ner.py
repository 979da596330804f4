"""NER inference operator (SURVEY §2.8 M1/M3/M4, §7.1 M3).

Production shape: sentences flow through ONE ``mapInPandas`` stage whose
Arrow batches are tokenized, batch-forwarded through the model, Viterbi/
greedy-decoded, and re-aligned to word level (first-subword rule, SURVEY
F10).  The model is loaded once per Python worker via a module-level lazy
singleton (reference analog: ``lru_cache`` tokenizer memoization,
``src/tokenization.py:11-32``) — never per batch, never per row.

In this sandbox no torch/transformers are installed, so the default model
is the frozen dictionary tagger (FIXTURES.md §8): a deterministic
longest-match gazetteer that honours the exact same contract (word-level
BIO tags out, one per token).  ``TransformerTagger`` documents and gates
the real path behind an import-try.

Scale notes:
  * batch size is controlled by spark.sql.execution.arrow.maxRecordsPerBatch
    (session.py) — the analog of the reference's DataLoader batch size.
  * To cut pad-waste on a real transformer, pre-bucket by length:
    ``tag_sentences(..., bucket_lengths=True)`` (= ``bucket_by_length``,
    a RangePartition on size(tokens); reference pads per arrival order;
    SURVEY §4.1).
  * torch threads must be pinned (torch.set_num_threads(1)) because Spark
    already runs one Python worker per core.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame

from ..schemas import TAGGED


class DictionaryTagger:
    """Frozen longest-match gazetteer tagger (deterministic fixture model).

    dictionary: lowercase token-tuple -> entity label.  Longest match
    wins; matches never overlap; unmatched tokens get 'O'.
    """

    def __init__(self, dictionary: Dict[Tuple[str, ...], str]):
        self.dictionary = dict(dictionary)
        self.max_len = max((len(k) for k in self.dictionary), default=1)
        # first-token index: the overwhelmingly common case (token opens
        # no entry) costs ONE str dict probe — no tuple allocation, no
        # per-width loop.  Candidates sorted longest-first preserve the
        # longest-match-wins semantics exactly.
        index: Dict[str, list] = {}
        for key, label in self.dictionary.items():
            index.setdefault(key[0], []).append(
                (len(key), key, "B-" + label, "I-" + label))
        for cands in index.values():
            cands.sort(key=lambda c: -c[0])
        self._index = index

    def tag(self, tokens: List[str]) -> List[str]:
        lowered = [t.lower() for t in tokens]
        n = len(tokens)
        tags = ["O"] * n
        index = self._index
        i = 0
        while i < n:
            step = 1
            cands = index.get(lowered[i])
            if cands is not None:
                for width, key, btag, itag in cands:
                    if width <= n - i and tuple(lowered[i:i + width]) == key:
                        tags[i] = btag
                        for j in range(i + 1, i + width):
                            tags[j] = itag
                        step = width
                        break
            i += step
        return tags


def bucket_by_length(sentences: DataFrame,
                     partitions: int | None = None) -> DataFrame:
    """Length-bucketed repartition for transformer inference (SURVEY
    §4.1): RangePartition on size(tokens) so Arrow batches hold
    similar-length sentences and fixed-shape padded minibatches waste
    few pad tokens (the reference pads per arrival order).

    Costs one shuffle — worth it only when the model forward dominates
    (a real transformer); the dictionary tagger pads nothing, so
    ``tag_sentences(..., bucket_lengths=False)`` stays the default."""
    from pyspark.sql import functions as F
    n = partitions or sentences.sparkSession.sparkContext.defaultParallelism
    return sentences.repartitionByRange(n, F.size("tokens"))


def tag_sentences(sentences: DataFrame,
                  dictionary: Dict[Tuple[str, ...], str],
                  bucket_lengths: bool = False) -> DataFrame:
    """sentences -> + pred_tags, via one Arrow-batched ``mapInArrow``
    stage.

    mapInArrow (not mapInPandas) because a tagger only READS the tokens:
    url / sent_id / tokens pass through as the original Arrow buffers
    (zero copy, no pandas object boxing on the way out) and only the new
    pred_tags column is built Python-side.  The pandas path converted
    every column arrow->pandas->arrow per batch — pure overhead for a
    passthrough.  (The real-transformer path keeps the same shape: the
    forward pass consumes token lists, everything else rides through.)

    The dictionary rides the closure (Spark broadcasts task binaries);
    for a dictionary beyond ~10s of MB use ``sc.broadcast`` explicitly.
    """
    # plain dict in the closure; reconstructed once per worker
    items = list(dictionary.items())

    def fn(batches):
        import pyarrow as pa
        model = DictionaryTagger(dict(items))  # once per worker/stage
        tag = model.tag
        tag_type = pa.list_(pa.string())
        for batch in batches:
            toks_col = batch.column(2)
            tags = pa.array([tag(t) for t in toks_col.to_pylist()],
                            type=tag_type)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), toks_col, tags],
                names=["url", "sent_id", "tokens", "pred_tags"])

    # input pruned to exactly what inference needs (Arrow width matters:
    # sent_text duplicates tokens byte-for-byte)
    pruned = sentences.select("url", "sent_id", "tokens")
    if bucket_lengths:
        pruned = bucket_by_length(pruned)
    return pruned.mapInArrow(fn, schema=TAGGED)


# dyadic-rational transition scores (k/256 — exactly representable
# doubles, so every DP sum is bit-identical in any IEEE engine)
VITERBI_TRANSITIONS = [[8 / 256, -32 / 256, 4 / 256],
                       [2 / 256, 6 / 256, 16 / 256],
                       [-4 / 256, 12 / 256, 8 / 256]]


def viterbi_tag_scores(sentences: DataFrame, n_tags: int = 3) -> DataFrame:
    """M3 exercised as a REAL Arrow stage with a cross-engine oracle:
    per sentence, emission[t][k] = md5(k|token)'s first byte / 256 (an
    exact dyadic rational), transitions = ``VITERBI_TRANSITIONS``, and
    ``functions/crf.viterbi_decode`` runs inside ``mapInArrow`` exactly
    where a CRF head's decode runs in production.  Because every score
    is a dyadic rational and the DP visits positions in a fixed order,
    the DuckDB recursive-CTE oracle reproduces path AND score
    bit-identically — no rounding tolerance needed.

    Returns (url, sent_id, path, score): path as comma-joined tag
    indices, score as the raw (exactly-reproducible) double.
    """
    from ..functions.crf import path_score, viterbi_decode

    if n_tags > len(VITERBI_TRANSITIONS):
        raise ValueError(
            f"n_tags={n_tags} exceeds the {len(VITERBI_TRANSITIONS)}-tag "
            "transition matrix — extend VITERBI_TRANSITIONS (fail fast on "
            "the driver, not inside an executor batch)")
    trans = [row[:n_tags] for row in VITERBI_TRANSITIONS[:n_tags]]

    def fn(batches):
        import hashlib

        import pyarrow as pa

        def em(tok: str, k: int) -> float:
            h = hashlib.md5(f"{k}|{tok}".encode()).hexdigest()
            return int(h[:2], 16) / 256.0

        for batch in batches:
            urls = batch.column(0)
            sids = batch.column(1)
            paths, scores = [], []
            for toks in batch.column(2).to_pylist():
                ems = [[em(t, k) for k in range(n_tags)] for t in toks]
                p = viterbi_decode(ems, trans)
                paths.append(",".join(map(str, p)))
                # NO rounding: every term is an exact dyadic rational,
                # so the raw double is already bit-identical to the
                # oracle's (a decimal round here would reintroduce
                # half-way-tie divergence between rounding modes)
                scores.append(path_score(p, ems, trans))
            yield pa.RecordBatch.from_arrays(
                [urls, sids, pa.array(paths, type=pa.string()),
                 pa.array(scores, type=pa.float64())],
                names=["url", "sent_id", "path", "score"])

    return sentences.select("url", "sent_id", "tokens").mapInArrow(
        fn, schema="url string, sent_id int, path string, score double")


#: feature width of the linear tagger below (md5 nibbles per subword)
LINEAR_FEAT_DIM = 4


def linear_tagger_weights(n_tags: int = 3) -> List[List[int]]:
    """The md5-derived (LINEAR_FEAT_DIM × n_tags) integer weight matrix
    of the linear emission model — numerators over 4096 (every weight is
    (first md5 nibble of 'w|f|k') − 8, so emissions are exact dyadic
    rationals any IEEE engine reproduces).  In production these numbers
    come from a checkpoint; ONLY that loading step is env-gated — the
    forward/align/decode shape below is the real one."""
    import hashlib
    return [[int(hashlib.md5(f"w|{f}|{k}".encode()).hexdigest()[0], 16) - 8
             for k in range(n_tags)]
            for f in range(LINEAR_FEAT_DIM)]


def linear_tag_words(sentences: DataFrame, n_tags: int = 3,
                     max_length: int = 24) -> DataFrame:
    """M1-shape inference WITHOUT torch (VERDICT r02 #4): the full
    tokenize → batched matrix forward → Viterbi decode → first-subword
    realign pipeline of ``TransformerTagger.tag_batch``, with a
    deterministic linear emission model so the whole path is
    oracle-checkable.  Per Arrow batch:

      1. tokenize: ``fake_word_ids`` (F10/F12 — [CLS]/[SEP] wrapping,
         1 + len//4 pieces per word, truncation to ``max_length``);
         piece strings are BERT-ish (``tok``, ``tok##1``, ...).
      2. forward: ONE numpy matmul for the whole batch — X (n_subwords ×
         4 md5-nibble features, ints) @ W (4 × n_tags ints), emissions =
         product / 4096 (exact dyadic rationals).
      3. decode: ``functions/crf.viterbi_decode`` over every subword
         position (specials included, exactly like a real logits
         tensor), transitions = VITERBI_TRANSITIONS.
      4. realign: ``functions/align.first_subword_inverse`` back to
         word-level tags; truncated-away words drop (F12 prefix rule).

    Returns (url, sent_id, word_tags, n_words, score) — bit-identical
    to the DuckDB recursive-CTE oracle, no rounding tolerance.
    """
    from ..functions.align import fake_word_ids, first_subword_inverse
    from ..functions.crf import path_score, viterbi_decode

    if n_tags > len(VITERBI_TRANSITIONS):
        raise ValueError(
            f"n_tags={n_tags} exceeds the {len(VITERBI_TRANSITIONS)}-tag "
            "transition matrix")
    trans = [row[:n_tags] for row in VITERBI_TRANSITIONS[:n_tags]]
    w_num = linear_tagger_weights(n_tags)

    def fn(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa

        W = np.array(w_num, dtype=np.int64)            # (4, K)

        def pieces_of(toks):
            out = ["[CLS]"]
            for tok in toks:
                out.append(tok)
                out.extend(f"{tok}##{j}" for j in range(1, 1 + len(tok) // 4))
            out.append("[SEP]")
            if len(out) > max_length:                   # F12: keep [SEP]
                out = out[:max_length - 1] + ["[SEP]"]
            return out

        def feats(piece):
            h = hashlib.md5(piece.encode()).hexdigest()
            return [int(c, 16) for c in h[:LINEAR_FEAT_DIM]]

        for batch in batches:
            urls, sids = batch.column(0), batch.column(1)
            sents = batch.column(2).to_pylist()
            piece_lists = [pieces_of(t) for t in sents]
            wid_lists = [fake_word_ids([len(t) for t in toks],
                                       max_length=max_length)
                         for toks in sents]
            # batched forward: one integer matmul for the whole batch,
            # exact division by the dyadic denominator afterwards.
            # (explicit 2-D empty shape: a zero-row Arrow batch must not
            # feed a 1-D empty array into the matmul)
            flat = [p for ps in piece_lists for p in ps]
            X = (np.array([feats(p) for p in flat], dtype=np.int64)
                 if flat else np.zeros((0, LINEAR_FEAT_DIM), dtype=np.int64))
            E = (X @ W) / 4096.0                       # (n_subwords, K)
            tags_out, nw_out, sc_out, off = [], [], [], 0
            for ps, wids in zip(piece_lists, wid_lists):
                ems = E[off:off + len(ps)].tolist()
                off += len(ps)
                path = viterbi_decode(ems, trans)
                words = first_subword_inverse(wids, path)
                tags_out.append(",".join(map(str, words)))
                nw_out.append(len(words))
                sc_out.append(path_score(path, ems, trans))
            yield pa.RecordBatch.from_arrays(
                [urls, sids,
                 pa.array(tags_out, type=pa.string()),
                 pa.array(nw_out, type=pa.int32()),
                 pa.array(sc_out, type=pa.float64())],
                names=["url", "sent_id", "word_tags", "n_words", "score"])

    return sentences.select("url", "sent_id", "tokens").mapInArrow(
        fn, schema="url string, sent_id int, word_tags string, "
                   "n_words int, score double")


class TransformerTagger:
    """Real DistilBERT-CRF-style inference path (reference
    ``src/modeling.py:91-132``): tokenize with word alignment, batched
    forward, CRF Viterbi (or greedy argmax) decode, first-subword
    realignment.

    The whole alignment algebra (F10 first-subword mapping + inverse,
    F11 RoBERTa continuation rule, F12 truncation semantics, F13 Ġ
    cleanup) is IMPLEMENTED and property-tested in
    ``functions/align.py`` — only the forward pass itself needs torch +
    transformers, which this container does not ship; the constructor
    documents the production lifecycle and fails loudly otherwise.
    Per sentence inside ``tag_batch``:

        enc    = tokenizer(words, is_split_into_words=True,
                           truncation=True, max_length=self.max_length)
        logits = model(**enc)                       # batched forward
        sub    = functions/crf.viterbi_decode(logits, crf.transitions)
                 # (or crf.greedy_decode — both implemented + tested)
        tags   = first_subword_inverse(enc.word_ids(), sub)   # F10
    """

    def __init__(self, model_dir: str, decode: str = "viterbi",
                 max_length: int = 192, batch_size: int = 64):
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "TransformerTagger needs torch+transformers. Production "
                "lifecycle: load model once per Python worker (module "
                "singleton), torch.set_num_threads(1), forward in Arrow-"
                "batch-sized minibatches, then functions/align."
                "first_subword_inverse for word-level tags."
            ) from e
        self.model_dir = model_dir
        self.decode = decode
        self.max_length = max_length
        self.batch_size = batch_size
