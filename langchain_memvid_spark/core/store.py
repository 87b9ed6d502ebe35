"""SparkVectorStore — the reference's VectorStore re-expressed Spark-first.

Two Parquet-backed tables ARE the engine (SURVEY.md §7):

  doc_index(doc_id, text, source, category, metadata_json,
            metadata_hash, embedding array<float>)
      ≙ FAISS index + essential metadata
        (/root/reference/src/langchain_memvid/index.py:222-237,626-630)
  payload(doc_id, payload_json)
      ≙ the QR-frame video archive
        (/root/reference/src/langchain_memvid/encoder.py:190-204)

Observable semantics replicated from the reference:
  - doc_id = insertion position; ids renumbered 0..n-1 after deletes
    (index.py:230,433-435)
  - add_texts dedups exact text vs existing corpus AND within batch,
    but returns ["0".."n-1"] for the submitted batch regardless
    (index.py:202-218, vectorstore.py:221)
  - delete_by_texts removes only the FIRST occurrence per text
    (index.py:389-393)
  - cosine/ip similarity is inner product on L2-normalized vectors,
    higher=better; l2 is squared distance, lower=better
    (index.py:144-148,293-295,327)
  - search results carry essential metadata + metadata_type flag;
    include_full_metadata joins the payload table
    (retriever.py:218-251, vectorstore.py:782-813)

Deliberate divergences (reference defects, SURVEY.md §4): we embed
AFTER dedup, deletes never re-embed, and appends never clobber the
archive.
"""

from __future__ import annotations

import copy
import json
import os
import re
import time
from dataclasses import dataclass, field
from typing import Any, Iterable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from langchain_memvid_spark.config import EngineConfig
from langchain_memvid_spark.core.ids import add_sequential_ids
from langchain_memvid_spark.embeddings import HashEmbeddings
from langchain_memvid_spark.exceptions import (
    FilterError,
    IndexError_,
    RetrievalError,
    StorageError,
)
from langchain_memvid_spark.functions.vector import dot, l2_normalize, l2_sq
from langchain_memvid_spark.operators.quantize import (
    int8_dot,
    quantize4_cols,
    quantize_cols,
    query_codes,
)

INGEST_SCHEMA = StructType(
    [
        StructField("__pos", LongType()),
        StructField("text", StringType()),
        StructField("metadata_json", StringType()),
    ]
)

INDEX_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("source", StringType()),
        StructField("category", StringType()),
        StructField("metadata_json", StringType()),
        StructField("metadata_hash", StringType()),
        StructField("embedding", ArrayType(FloatType())),
        # int8 codes + per-vector scale for the compressed-domain first
        # pass: 1 byte/dim vs 4 — the 100 TB search path scans these and
        # touches float32 only for the re-rank candidates.
        StructField("qscale", DoubleType()),
        StructField("qvec", ArrayType(ByteType())),
        # packed int4 codes + scale (2 vectors/byte): the sub-byte tier
        # of the quantization ladder, persisted at ingest so int4
        # search scans stored codes instead of re-deriving them per
        # query (VERDICT r6 item 6).
        StructField("pscale", DoubleType()),
        StructField("pvec", ArrayType(ByteType())),
        # MinHash signature (8 longs/doc), persisted at ingest like the
        # quantized codes: the near-dup ingest gate
        # (IndexConfig.near_dedup) anti-joins arriving batches against
        # THESE columns, so no batch ever re-signs the existing corpus
        # (operators/dedup.incremental_near_dup's corpus_sig path).
        *[StructField(f"mh{j}", LongType()) for j in range(8)],
    ]
)

_MH_COLS = [f"mh{j}" for j in range(8)]

PAYLOAD_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_json", StringType()),
    ]
)


@dataclass
class SearchResult:
    """≙ reference SearchResult dataclass
    (/root/reference/src/langchain_memvid/index.py:28-62)."""

    text: str
    source: str | None
    category: str | None
    similarity: float
    metadata: dict[str, Any] = field(default_factory=dict)


@dataclass
class StorageStats:
    """Real aggregates, not the reference's hard-coded guesses
    (/root/reference/src/langchain_memvid/vectorstore.py:858-859 —
    which estimate essential as docs*0.001 MB and full as 80% of the
    video file). The reference-named accessors below expose the SAME
    field surface (types.py:33-42) computed from the measured bytes:
    the essential tier is the index table (text + metadata + vectors
    + codes), the full tier / 'video file' is the payload table."""

    document_count: int
    index_bytes: int
    payload_bytes: int
    frame_mapping_count: int

    _MB = 1024.0 * 1024.0

    @property
    def total_documents(self) -> int:
        return self.document_count

    @property
    def video_file_size_mb(self) -> float:
        return self.payload_bytes / self._MB

    @property
    def index_size_mb(self) -> float:
        return self.index_bytes / self._MB

    @property
    def essential_metadata_size_mb(self) -> float:
        return self.index_bytes / self._MB

    @property
    def full_metadata_size_mb(self) -> float:
        return self.payload_bytes / self._MB

    @property
    def redundancy_percentage(self) -> float:
        """essential/full ratio as a percent (the reference's formula,
        vectorstore.py:860-863, over real bytes)."""
        if self.payload_bytes <= 0:
            return 0.0
        return self.index_bytes / self.payload_bytes * 100.0

    @property
    def storage_efficiency(self) -> str:
        return "hybrid"  # two-tier essential/full split, like the reference

    @property
    def frame_mapping_stats(self):
        """doc_id IS the frame key in this engine (identity mapping by
        id assignment), so coverage is structural: every stored row is
        mapped."""
        from langchain_memvid_spark.types import FrameMappingStats

        return FrameMappingStats(
            total_documents=self.document_count,
            mapped_documents=self.frame_mapping_count,
            # derived, not asserted: the public constructor could be
            # built with diverging counts, and the dataclass must not
            # self-contradict
            mapping_coverage=(
                self.frame_mapping_count / self.document_count * 100.0
                if self.document_count
                else 0.0
            ),
            mapping_efficiency={
                "strategy": "identity (doc_id is the physical order key)",
                "dict_entries": 0,
            },
        )


_FILTER_KEY_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_\-]*$")
_FILTER_OPS = frozenset({"$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in"})


_SCHEMA_DTYPES = frozenset({"double", "boolean", "string"})


def metadata_predicate(
    filter: dict[str, Any], schema: dict[str, str] | None = None
) -> F.Column:
    """AND of per-key predicates over ``doc_index``-shaped rows. Engine
    columns (source/category) compare directly (pushdown-friendly);
    other keys go through the ``metadata_json`` column with TYPED
    comparisons:

    - bool compares against the canonical JSON literal 'true'/'false'
      (NOT str(val) — ADVICE r4 #1);
    - int/float casts the extracted string to double so 2 matches 2.0;
    - str compares the unquoted extraction directly.

    Known dialect limitation WITHOUT a schema: ``get_json_object``
    strips quotes, so the extraction cannot distinguish the JSON
    string ``"2"`` from the number ``2`` (or ``"false"`` from
    ``false``) — a numeric filter also matches numeric-LOOKING string
    values and a bool filter matches the strings 'true'/'false'.
    Cross-type comparisons never throw and never false-negative.

    ``schema`` closes that ambiguity per key (VERDICT r5 item 5): map
    a key to ``'double'``/``'boolean'``/``'string'`` and its values are
    extracted via ``from_json`` STRICT typing instead — a JSON string
    ``"2"`` extracts to NULL under ``double`` (never matches a numeric
    filter), ``"true"`` to NULL under ``boolean``, and under
    ``'string'`` JSON numbers/booleans are excluded from matching.
    The filter value's Python type must agree with the declared dtype
    (FilterError otherwise — a silent no-match would hide the typo).
    Keys absent from the schema keep the permissive dialect above.

    Values may be scalars (equality) or operator dicts in the
    LangChain/Mongo dialect: ``{"$gt": v}`` ``$gte`` ``$lt`` ``$lte``
    ``$ne`` ``$in`` ``$eq``.  SQL NULL semantics: rows missing the key
    never match (including ``$ne``).  ``None`` values and
    non-identifier keys raise FilterError — JSONPath cannot distinguish
    a null value from a missing key, and interpolated keys with
    ``.``/``[`` would silently query the wrong path (ADVICE r4 #2)."""
    for key in filter:
        # validate BEFORE sorted(): a non-str key would otherwise raise
        # a raw TypeError from re.match or from sorting mixed key types
        if not isinstance(key, str) or not _FILTER_KEY_RE.match(key):
            raise FilterError(
                f"filter key {key!r} is not a plain identifier; nested/quoted "
                "JSONPath keys are not supported"
            )
    for key, dtype in (schema or {}).items():
        if dtype not in _SCHEMA_DTYPES:
            raise FilterError(
                f"metadata schema dtype {dtype!r} for key {key!r} is not one "
                f"of {sorted(_SCHEMA_DTYPES)}"
            )
        if not isinstance(key, str) or not _FILTER_KEY_RE.match(key):
            # same identifier rule as filter keys, enforced at the
            # DECLARATION so a schema whose keys could never be
            # filtered on fails fast (quotes/backticks/parens would
            # break the from_json schema string and raw-text anchor)
            raise FilterError(
                f"metadata schema key {key!r} is not a plain identifier; "
                "only [A-Za-z_][A-Za-z0-9_-]* keys can be typed-filtered"
            )
    cond = F.lit(True)
    for key, spec in sorted(filter.items()):
        ops = spec if isinstance(spec, dict) else {"$eq": spec}
        for op, val in ops.items():
            if op not in _FILTER_OPS:
                raise FilterError(
                    f"unsupported filter operator {op!r} for key {key!r}; "
                    f"supported: {sorted(_FILTER_OPS)}"
                )
            cond = cond & _one_predicate(key, op, val, (schema or {}).get(key))
    return cond


def _typed_json_col(key: str, dtype: str, mj: F.Column | None = None) -> F.Column:
    """STRICT per-key extraction: from_json with a single-field typed
    schema returns NULL when the stored JSON value is not of the
    declared type (verified: '\"2\"' under double -> NULL, 'true'
    under boolean only for the bare literal).  For 'string' the
    coercing string extraction is masked to NULL wherever the value
    strictly parses as a number or boolean, so declared-string keys
    never match stored numerics.

    Special float literals (ADVICE r6): from_json parses the JSON
    STRINGS "NaN"/"Infinity"/"+INF"/"-INF" as doubles, which would (a)
    mask a declared-string key storing "NaN" to NULL and (b) let a
    declared-double key match the STRING "NaN" against numeric range
    filters.  When the extracted double is non-finite, a raw-text
    check (is the value quoted in the stored JSON?) decides: quoted →
    it is a string (excluded from the numeric type, visible to the
    string type); bare → a genuine non-finite number.  The check
    anchors on '{{' or ',' before the key, so an escaped \\" inside
    another value cannot fake it (only a same-named key inside a
    NESTED object value could — nested keys are outside this flat
    dialect's contract)."""
    if mj is None:
        mj = F.col("metadata_json")
    # re.escape: keys are data, not patterns — an unescaped '(' or '.'
    # would throw PatternSyntaxException / silently over-match
    quoted = mj.rlike('[{,]\\s*"' + re.escape(key) + '"\\s*:\\s*"')

    def _nonfinite(c: F.Column) -> F.Column:
        return F.isnan(c) | (F.abs(c) == F.lit(float("inf")))

    if dtype == "string":
        num = F.from_json(mj, f"`{key}` double")[key]
        is_num = num.isNotNull() & ~(_nonfinite(num) & quoted)
        is_bool = F.from_json(mj, f"`{key}` boolean")[key].isNotNull()
        return F.when(~is_num & ~is_bool, F.get_json_object(mj, f"$.{key}"))
    if dtype == "double":
        num = F.from_json(mj, f"`{key}` double")[key]
        return F.when(~(_nonfinite(num) & quoted), num)
    return F.from_json(mj, f"`{key}` {dtype}")[key]


def _one_predicate(key: str, op: str, val: Any, dtype: str | None = None) -> F.Column:
    """One typed comparison column for ``key <op> val``."""
    vals = val if op == "$in" else [val]
    if not isinstance(vals, (list, tuple)) or (op == "$in" and not vals):
        raise FilterError(f"$in for key {key!r} needs a non-empty list")
    for v in vals:
        if v is None:
            raise FilterError(
                f"None is not a valid filter value for key {key!r}: JSON "
                "extraction cannot distinguish null from a missing key"
            )
        if not isinstance(v, (bool, int, float, str)):
            raise FilterError(
                f"unsupported filter value type {type(v).__name__} for key {key!r}"
            )
    if key in ("source", "category"):
        # engine columns are STRING; a numeric/bool literal would make
        # Spark cast the COLUMN under ANSI mode (Spark 4 default) and
        # throw CAST_INVALID_INPUT on the first non-numeric row instead
        # of simply not matching — reject loudly up front
        if not all(isinstance(v, str) for v in vals):
            raise FilterError(
                f"{key} is a string column; filter values must be strings, "
                f"got {vals!r}"
            )
        col = F.col(key)
        lits = list(vals)
    elif dtype is not None:
        # strict per-key typed extraction; the filter value type must
        # agree with the declaration or the mismatch is a loud error
        checks = {
            "double": lambda v: isinstance(v, (int, float)) and not isinstance(v, bool),
            "boolean": lambda v: isinstance(v, bool),
            "string": lambda v: isinstance(v, str),
        }
        if not all(checks[dtype](v) for v in vals):
            raise FilterError(
                f"filter values {vals!r} for key {key!r} do not match its "
                f"declared metadata schema type {dtype!r}"
            )
        col = _typed_json_col(key, dtype)
        lits = [float(v) for v in vals] if dtype == "double" else list(vals)
    else:
        raw = F.get_json_object(F.col("metadata_json"), f"$.{key}")
        if all(isinstance(v, bool) for v in vals):
            col, lits = raw, ["true" if v else "false" for v in vals]
        elif all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals):
            # try_cast, NOT cast: under ANSI mode (Spark 4 default) a
            # plain cast THROWS on rows whose stored value is not
            # numeric ('false', 'abc'); the dialect's contract is that
            # such rows simply don't match (null comparison)
            col, lits = raw.try_cast("double"), [float(v) for v in vals]
        elif all(isinstance(v, str) for v in vals):
            col, lits = raw, list(vals)
        else:
            raise FilterError(f"mixed-type filter values for key {key!r}: {vals!r}")
    if op == "$in":
        return col.isin(lits)
    lit = F.lit(lits[0])
    if op == "$eq":
        return col == lit
    if op == "$ne":
        return col != lit
    if op == "$gt":
        return col > lit
    if op == "$gte":
        return col >= lit
    if op == "$lt":
        return col < lit
    return col <= lit  # $lte


def _canonical_meta_json(meta: dict[str, Any]) -> str:
    # ensure_ascii=False: raw UTF-8 matches Spark's to_json and DuckDB's
    # to_json byte-for-byte, so streaming ingest and the SQL oracles can
    # reproduce the metadata_hash for non-ASCII values too
    return json.dumps(
        meta, sort_keys=True, separators=(",", ":"), default=str, ensure_ascii=False
    )


class SparkVectorStore:
    """PySpark-native vector store with the reference's API surface."""

    def __init__(
        self,
        spark: SparkSession,
        embeddings: Any | None = None,
        config: EngineConfig | None = None,
        metadata_schema: dict[str, str] | None = None,
    ):
        """``metadata_schema`` optionally maps metadata keys to
        'double'/'boolean'/'string' for STRICTLY typed filter
        comparisons (see metadata_predicate — closes the documented
        quote-stripping ambiguity where a numeric filter matched
        numeric-looking string values). Unlisted keys keep the
        permissive dialect."""
        self.spark = spark
        # Deep-copy: the store OWNS its config from here on.  rebuild_ivf
        # writes the live nlist back into config.index, so two stores
        # sharing one caller-held EngineConfig object would silently
        # resize each other's quantizer (ADVICE r7); the caller's object
        # stays a pure construction argument.
        self.config = copy.deepcopy(config) if config is not None else EngineConfig()
        self.metadata_schema = metadata_schema
        if metadata_schema:
            # fail fast at the DECLARATION: a bad dtype or
            # non-identifier key should not surface hours later on the
            # first filtered search (the empty filter exercises only
            # the schema-validation loop)
            metadata_predicate({}, schema=metadata_schema)
        self.embeddings = embeddings or HashEmbeddings(self.config.index.dim)
        self._doc_index: DataFrame = spark.createDataFrame([], INDEX_SCHEMA)
        self._payload: DataFrame = spark.createDataFrame([], PAYLOAD_SCHEMA)
        self._count = 0
        # IVF layout state (config.index.ivf): once trained, _ivf holds
        # the centroids and _doc_index IS the partitionBy(cluster_id)
        # parquet scan — uncached, so the cluster_id.isin(probes) filter
        # stays a file-level PartitionFilter instead of an in-memory
        # batch filter. None = flat layout (the default).
        self._ivf = None
        self._ivf_version = 0
        self._layout_base: str | None = None
        # per-batch build record (≙ the reference's BuildStats return
        # from Encoder.build_video, encoder.py:212-218) — None until
        # the first ingest
        self.last_build_stats = None
        # True when the live IVF layout points at a directory the store
        # does NOT own (a load()ed save snapshot): the first append
        # copies the layout into the store's versioned root before
        # writing, so the user's saved artifact stays immutable
        # (ADVICE r7 — appends used to mutate the save path in place).
        self._layout_foreign = False
        # True when the live IVF layout's parquet FILES are missing some
        # engine columns (attach() of a streamed table, load() of an
        # older save) and those columns exist only as in-plan
        # derivations: any re-read of the directory must re-derive them
        # or the explicit-schema scan fills NULL for the original files
        # and the int8 first pass silently drops the whole old corpus.
        self._layout_derived = False

    # ------------------------------------------------------------------ ingest

    @classmethod
    def from_texts(
        cls,
        texts: list[str],
        spark: SparkSession,
        metadatas: list[dict[str, Any]] | None = None,
        embeddings: Any | None = None,
        config: EngineConfig | None = None,
    ) -> "SparkVectorStore":
        """≙ VectorStore.from_texts
        (/root/reference/src/langchain_memvid/vectorstore.py:881-911)."""
        store = cls(spark, embeddings=embeddings, config=config)
        store.add_texts(texts, metadatas)
        return store

    @classmethod
    def from_documents(
        cls,
        documents: Iterable[Any],
        spark: SparkSession,
        embeddings: Any | None = None,
        config: EngineConfig | None = None,
    ) -> "SparkVectorStore":
        """≙ vectorstore.py:949-978; Document = (page_content, metadata)."""
        texts = [d.page_content if hasattr(d, "page_content") else d["text"] for d in documents]
        metas = [d.metadata if hasattr(d, "metadata") else d.get("metadata", {}) for d in documents]
        return cls.from_texts(texts, spark, metadatas=metas, embeddings=embeddings, config=config)

    def add_texts(
        self, texts: list[str], metadatas: list[dict[str, Any]] | None = None
    ) -> list[str]:
        """≙ VectorStore.add_texts (vectorstore.py:174-225).

        Pipeline (one DataFrame lineage; SURVEY.md §3.1): stage batch →
        in-batch first-occurrence dedup → anti-join vs existing texts →
        essential projection + sha256 metadata_hash → embed (Arrow
        pandas_udf) AFTER dedup → normalize if cosine → append to both
        tables. Returns batch-local ids ["0".."n-1"] like the reference
        (vectorstore.py:221).
        """
        if not texts:
            # the reference's exact loud contract (vectorstore.py:195)
            raise ValueError("No texts provided to add")
        if metadatas is not None and len(metadatas) != len(texts):
            raise IndexError_(
                f"texts/metadatas length mismatch: {len(texts)} vs {len(metadatas)}"
            )
        metas = metadatas or [{} for _ in texts]
        rows = [
            (i, t, _canonical_meta_json({**m}))
            for i, (t, m) in enumerate(zip(texts, metas))
        ]
        staged = self.spark.createDataFrame(rows, INGEST_SCHEMA)
        n_parts = max(1, min(self.spark.sparkContext.defaultParallelism, len(rows) // 256 + 1))
        self._ingest(staged, n_parts)
        return [str(i) for i in range(len(texts))]

    def add_dataframe(
        self,
        df: DataFrame,
        text_col: str = "text",
        order_col: str | None = None,
        embedding_col: str | None = None,
        metadata_json_col: str | None = None,
    ) -> int:
        """Distributed bulk ingest — the 100 TB path the reference's
        list-based add_texts (vectorstore.py:174-225) cannot express:
        rows stay a DataFrame end to end (no driver-side lists), and a
        precomputed ``embedding_col`` skips the embed UDF entirely so an
        upstream embedding pipeline's output loads at scan speed.

        ``order_col`` fixes the deterministic doc_id order (ids follow
        it via the two-phase range-partitioned offset pattern — no
        single-reducer stage). Dedup semantics match add_texts: first
        occurrence per text within the batch, anti-join vs the existing
        corpus. Returns the ingested row count."""
        if order_col is None:
            raise IndexError_("add_dataframe requires an explicit order_col")
        cols = [
            F.col(order_col).cast("long").alias("__pos"),
            F.col(text_col).cast("string").alias("text"),
            (
                F.coalesce(F.col(metadata_json_col), F.lit("{}"))
                if metadata_json_col
                else F.lit("{}")
            ).alias("metadata_json"),
        ]
        if embedding_col:
            cols.append(F.col(embedding_col).cast("array<float>").alias("embedding"))
        before = self._count
        n_parts = max(1, self.spark.sparkContext.defaultParallelism)
        self._ingest(df.select(*cols), n_parts)
        return self._count - before

    def _ingest(self, staged: DataFrame, n_parts: int) -> None:
        """Shared ingest lineage (SURVEY.md §3.1): in-batch
        first-occurrence dedup → anti-join vs existing texts →
        range-partitioned id assignment → essential projection + sha256
        metadata_hash → embed (Arrow pandas_udf) AFTER dedup unless the
        batch carries precomputed vectors → normalize if cosine → int8
        codes → append to both tables (IVF-assigned partition append
        when the layout is live)."""
        t0 = time.time()
        start_count = self._count
        # first occurrence within batch (reference keeps first, index.py:211-218)
        w = Window.partitionBy("text").orderBy("__pos")
        staged = staged.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
        # anti-join vs existing corpus (index.py:202-210)
        staged = staged.join(self._doc_index.select("text"), "text", "left_anti")
        # sign the surviving batch ONCE: the signatures both feed the
        # near-dup gate (when enabled) and persist as mh0..mh7 columns
        # so FUTURE batches gate against stored longs, never corpus text
        from langchain_memvid_spark.operators.dedup import (
            incremental_near_dup,
            minhash_signatures,
        )

        batch_ids = staged.select(F.col("__pos").alias("doc_id"), "text")
        sig_new = minhash_signatures(batch_ids).localCheckpoint()
        if self.config.index.near_dedup and self._count > 0:
            # corpus rows from pre-signature files (legacy layouts) read
            # mh as NULL — they simply don't participate in the gate
            corpus_sig = self._doc_index.select("doc_id", *_MH_COLS).filter(
                F.col("mh0").isNotNull()
            )
            dups = (
                incremental_near_dup(
                    # the checkpointed signatures stand in for the batch
                    # (only doc_id is read) so the verdict plan never
                    # re-executes the staged lineage above
                    sig_new.select("doc_id"),
                    corpus_sig=corpus_sig,
                    threshold=self.config.index.near_dedup_threshold,
                    new_sig=sig_new,
                    # count the CHECKPOINTED signatures, not batch_ids —
                    # whose lineage would re-run the anti-join above
                    n_new=sig_new.count(),
                )
                .filter(F.col("is_dup"))
                .select(F.col("doc_id").alias("__pos"))
            )
            staged = staged.join(dups, "__pos", "left_anti")
        staged = staged.join(
            sig_new.select(F.col("doc_id").alias("__pos"), *_MH_COLS), "__pos", "left"
        )
        # Scale-safe id assignment: range-partition on the batch position
        # (ascending ranges -> ascending partition ids), then the two-phase
        # offset pattern (core/ids.py). Ids follow __pos globally with NO
        # single-reducer stage, and the embed UDF below runs across all
        # partitions instead of being funneled through coalesce(1).
        staged = add_sequential_ids(
            staged.repartitionByRange(n_parts, "__pos"),
            id_col="doc_id",
            order_col="__pos",
            start=self._count,
        )

        meta_struct = F.from_json(
            F.col("metadata_json"), "source STRING, category STRING, id BIGINT"
        )
        enriched = (
            staged.withColumn("source", meta_struct["source"])
            .withColumn("category", meta_struct["category"])
            .withColumn("metadata_hash", F.sha2(F.col("metadata_json"), 256))
        )
        if "embedding" not in staged.columns:
            enriched = enriched.withColumn(
                "embedding", self.embeddings.udf()(F.col("text"))
            )
        if self.config.index.metric == "cosine":
            enriched = enriched.withColumn("embedding", l2_normalize(F.col("embedding")))
        qscale, qvec = quantize_cols(F.col("embedding"))
        pscale, pvec = quantize4_cols(F.col("embedding"))
        enriched = (
            enriched.withColumn("qscale", qscale)
            .withColumn("qvec", qvec)
            .withColumn("pscale", pscale)
            .withColumn("pvec", pvec)
        )

        new_index = enriched.select(
            "doc_id", "text", "source", "category", "metadata_json", "metadata_hash",
            "embedding", "qscale", "qvec", "pscale", "pvec", *_MH_COLS,
        )
        new_payload = enriched.select(
            "doc_id",
            F.to_json(
                F.struct(F.col("text"), F.col("metadata_json").alias("metadata"))
            ).alias("payload_json"),
        )
        old_index, old_payload = self._doc_index, self._payload
        if self._ivf is not None:
            # IVF-active append: assign cluster_id in the SAME lineage
            # (the pure-Catalyst argmax streaming ingest also uses, so
            # batch and stream assignment cannot diverge), append the
            # new partition files to the live layout, and re-point the
            # scan — new rows land on the pruned search path at commit.
            from langchain_memvid_spark.core.ivf import nearest_centroid_col

            assigned = new_index.withColumn(
                "cluster_id",
                nearest_centroid_col(
                    F.col("embedding"), self._ivf.centroids, metric=self._ivf_metric()
                ),
            )
            if self._layout_foreign:
                # copy-on-first-append: the live layout is a load()ed
                # save snapshot — rewrite it into the store's own
                # versioned root first, so the append lands in store-
                # owned files and the saved artifact stays immutable
                # (matches the flat store's copy-on-load semantics and
                # the reference's immutable save; pure reads never pay
                # this copy).
                self._swap_layout(self._doc_index)
                self._layout_foreign = False
            assigned.write.mode("append").partitionBy("cluster_id").parquet(self._ivf.path)
            idx = self.spark.read.schema(self._layout_schema()).parquet(self._ivf.path)
            if self._layout_derived:
                # the layout's ORIGINAL files (attach of a streamed
                # table / older save) lack some engine columns, so the
                # explicit-schema re-read returns NULL for them there —
                # re-derive per row or the pre-append corpus drops out
                # of the int8 first pass (every NULL score sorts last)
                idx = self._backfill_derived_cols(idx)
            self._doc_index = idx
        else:
            self._doc_index = self._doc_index.unionByName(new_index).cache()
        self._payload = self._payload.unionByName(new_payload).cache()
        self._count = self._doc_index.count()
        # ONE job materializes the payload cache AND measures the
        # batch: new rows are exactly doc_id >= start_count (ids are
        # contiguous 0..n-1 and appends come after any renumbering)
        prow = self._payload.agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("doc_id") >= start_count, F.length("payload_json"))
            ).alias("batch_b"),
        ).collect()[0]
        batch_payload_bytes = int(prow["batch_b"] or 0)
        # the new tables are materialized — release the superseded
        # cache entries so repeated ingests don't pin storage forever
        old_index.unpersist()
        old_payload.unpersist()
        self._maybe_truncate_lineage()
        self._maybe_build_ivf()
        from langchain_memvid_spark.types import BuildStats

        self.last_build_stats = BuildStats(
            total_chunks=self._count - start_count,
            video_size_mb=batch_payload_bytes / (1024.0 * 1024.0),
            encoding_time=round(time.time() - t0, 3),
            index_path=self._ivf.path if self._ivf is not None else None,
            video_path=None,  # the payload tier is in-session until save()
        )

    # ------------------------------------------------------------------ IVF

    def _layout_schema(self) -> StructType:
        """Explicit read schema for the partitioned layout: an ALL-rows
        delete leaves a next-version dir with no parquet files, and a
        schema-less read of it throws AnalysisException (inference
        needs at least one footer) — the explicit schema makes the
        empty layout a plain empty table instead of a crash."""
        from pyspark.sql.types import IntegerType

        return StructType(
            list(INDEX_SCHEMA.fields) + [StructField("cluster_id", IntegerType())]
        )

    # engine columns attach()/load() may derive in-plan when the
    # underlying files don't carry them physically
    _DERIVABLE_COLS = ("category", "qscale", "qvec", "pscale", "pvec")

    def _backfill_derived_cols(self, idx: DataFrame) -> DataFrame:
        """Re-derive the derivable engine columns wherever the stored
        value is NULL (files written before the column existed read as
        NULL under the explicit layout schema); rows from files that
        carry the columns keep their stored values."""
        qscale, qvec = quantize_cols(F.col("embedding"))
        pscale, pvec = quantize4_cols(F.col("embedding"))
        derived = {
            "category": F.from_json(F.col("metadata_json"), "category STRING")["category"],
            "qscale": qscale,
            "qvec": qvec,
            "pscale": pscale,
            "pvec": pvec,
        }
        for name, expr in derived.items():
            idx = idx.withColumn(name, F.coalesce(F.col(name), expr))
        return idx

    def _layout_root(self) -> str:
        """Directory that holds the versioned IVF layouts. Uses the
        configured storage base_path when set; a session temp dir
        otherwise (local mode — on a cluster base_path would be the
        shared filesystem). One store per base_path: two IVF stores
        sharing a base_path would overwrite each other's versions."""
        if self._layout_base is None:
            base = self.config.storage.base_path
            if base:
                self._layout_base = os.path.join(base, "ivf_layout")
            else:
                import tempfile

                self._layout_base = tempfile.mkdtemp(prefix="vs_ivf_")
        return self._layout_base

    def _swap_layout(self, assigned: DataFrame) -> None:
        """Write `assigned` (doc_index columns + cluster_id) as the next
        layout VERSION and re-point the scan. Versioned dirs, not
        overwrite-in-place: Spark cannot overwrite a path a plan is
        concurrently reading from, and the swap keeps the old files
        valid until the new commit lands (the reference's file-swap
        semantics, vectorstore.py:579-581)."""
        self._ivf_version += 1
        path = os.path.join(self._layout_root(), f"v{self._ivf_version}")
        assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(path)
        old = self._doc_index
        self._doc_index = self.spark.read.schema(self._layout_schema()).parquet(path)
        self._ivf.path = path
        self._count = self._doc_index.count()
        # the rewrite materialized every engine column physically, so
        # any attach/load-era in-plan derivations are now persisted —
        # and the layout now lives in the store's own versioned root,
        # so any foreign (save-snapshot) origin no longer applies
        self._layout_derived = False
        self._layout_foreign = False
        old.unpersist()

    _IVF_TRAIN_CAP = 100_000  # KMeans training-sample row bound

    def _ivf_metric(self) -> str:
        """One geometry for BOTH cluster assignment and search-time
        probing (probing under a different metric than assignment sends
        queries to the wrong partitions): l2 stores assign/probe by
        squared distance, cosine/ip by centroid cosine."""
        return "l2" if self.config.index.metric == "l2" else "cosine"

    def _maybe_build_ivf(self) -> None:
        """Train the IVF layout once the corpus passes the reference's
        30·nlist gate (index.py:152-162 — the gate that is dead code
        there, made live end-to-end here): KMeans centroids on the full
        corpus, cluster_id assigned via the shared pure-Catalyst argmax
        (core/ivf.py nearest_centroid_col), corpus persisted
        partitionBy(cluster_id). From then on _topk prunes to nprobe
        probes before the int8 first pass — two composed pruning layers
        on the user-facing search path."""
        ic = self.config.index
        if not ic.ivf or self._ivf is not None:
            return
        if self._count < ic.ivf_min_points_factor * ic.nlist:
            return
        from langchain_memvid_spark.core.ivf import (
            IVFIndex,
            nearest_centroid_col,
            train_centroids,
        )

        # ONE shared deterministic training recipe (core/ivf.py
        # train_centroids): bounded sample + canonicalized fit layout,
        # so the store and IVFIndex.build cannot drift apart on the
        # topology-determinism fix. The assignment below still covers
        # every row.
        cents = train_centroids(
            self._doc_index,
            ic.nlist,
            n=self._count,
            id_col="doc_id",
            cap=max(self._IVF_TRAIN_CAP, 256 * ic.nlist),
        )
        # the index keeps the RAW config metric (ADVICE r8: collapsing
        # ip→cosine here made IVFIndex.search rank an ip store by
        # cosine); probing/assignment already collapse ip→cosine
        # internally via _probe_metric, so only exact-pass scoring
        # changes — to dot, matching _topk
        self._ivf = IVFIndex(cents, metric=self.config.index.metric)
        assigned = self._doc_index.withColumn(
            "cluster_id",
            nearest_centroid_col(F.col("embedding"), cents, metric=self._ivf_metric()),
        )
        self._swap_layout(assigned)

    @property
    def ivf_index(self):
        """The trained IVFIndex (centroids + layout path), or None while
        the corpus is below the training gate / IVF is disabled."""
        return self._ivf

    def rebuild_ivf(self, nlist: int | None = None) -> bool:
        """Retrain the quantizer on the CURRENT corpus and rewrite the
        layout — the drift repair for long-lived stores: appends are
        assigned under the ORIGINAL centroids, so a shifted data
        distribution slowly skews clusters (hot partitions, weaker
        pruning). Optionally resizes ``nlist`` (a growing corpus wants
        more clusters: pruning ratio is nprobe/nlist). Returns True
        when a fresh layout was trained and swapped in; False when IVF
        is disabled or the corpus is still below the training gate."""
        ic = self.config.index
        if not ic.ivf:
            return False
        new_nlist = nlist if nlist is not None else ic.nlist
        if self._count < ic.ivf_min_points_factor * new_nlist:
            # gate BEFORE mutating: a refused rebuild must not leave the
            # shared config claiming an nlist the live layout never got
            return False
        ic.nlist = new_nlist
        self._ivf = None  # force a retrain over the current corpus
        self._maybe_build_ivf()
        return self._ivf is not None

    def compact_ivf_layout(self) -> int:
        """Consolidate the layout's small files into ~one file per
        cluster and swap in the compacted version — the maintenance op
        for append/streaming-heavy stores: every add_texts batch and
        every streaming microbatch writes a new file per touched
        cluster, and at 100 TB thousands of tiny files per partition
        make footer reads and task scheduling dominate scan time
        (sources/compact.py states the same problem for flat tables).

        Hash-repartitioning on cluster_id sends each cluster to one
        task, so the partitioned rewrite emits one file per cluster
        dir; the versioned-layout swap (_swap_layout) keeps the old
        files valid until the new commit lands, unlike the rename swap
        the flat compactor uses. Returns the new parquet file count."""
        from langchain_memvid_spark.sources.compact import parquet_file_count

        if self._ivf is None:
            raise IndexError_("no IVF layout is active")
        self._swap_layout(self._doc_index.repartition(F.col("cluster_id")))
        return parquet_file_count(self._ivf.path)

    def ivf_cluster_sizes(self) -> DataFrame:
        """Per-cluster row counts — the skew health check for the
        layout (a hot cluster means weaker pruning for queries probing
        it; rebuild_ivf with a larger nlist is the repair)."""
        if self._ivf is None:
            raise IndexError_("no IVF layout is active")
        return (
            self._doc_index.groupBy("cluster_id")
            .agg(F.count("*").alias("n_docs"))
            .orderBy("cluster_id")
        )

    # Each append/delete nests the logical plan one level deeper
    # (union/anti-join over the previous plan). Caching bounds
    # RECOMPUTATION but not driver-side plan processing — thousands of
    # appends in one session would bloat analysis/optimization time.
    # localCheckpoint() every N mutations truncates the lineage to a
    # scan of materialized blocks (same trick dedup.py's iterative
    # connected-components uses per round).
    _CHECKPOINT_EVERY = 16

    def _maybe_truncate_lineage(self) -> None:
        self._mutations = getattr(self, "_mutations", 0) + 1
        if self._mutations < self._CHECKPOINT_EVERY:
            return
        self._mutations = 0
        pay_cp = self._payload.localCheckpoint(eager=True)
        self._payload.unpersist()
        self._payload = pay_cp
        if self._ivf is not None:
            # doc_index is already a materialized parquet scan (the IVF
            # layout) — checkpointing it would only copy the corpus into
            # block storage and DROP the partition pruning
            return
        idx_cp = self._doc_index.localCheckpoint(eager=True)
        self._doc_index.unpersist()
        self._doc_index = idx_cp

    def add_documents(self, documents: Iterable[Any]) -> list[str]:
        texts = [d.page_content if hasattr(d, "page_content") else d["text"] for d in documents]
        metas = [d.metadata if hasattr(d, "metadata") else d.get("metadata", {}) for d in documents]
        return self.add_texts(texts, metas)

    def clear(self) -> None:
        """≙ Encoder.clear (encoder.py:229-232): drop everything staged/
        stored and reset to an empty corpus. Ingest here is atomic (no
        separate staging buffer), so clearing means truncating both
        tables (and releasing their cache entries)."""
        self._doc_index.unpersist()
        self._payload.unpersist()
        self._doc_index = self.spark.createDataFrame([], INDEX_SCHEMA)
        self._payload = self.spark.createDataFrame([], PAYLOAD_SCHEMA)
        self._count = 0
        self._ivf = None  # retrains once the corpus re-passes the gate
        self.last_build_stats = None  # stale stats describe dropped data

    # ------------------------------------------------------------------ search

    def _phase1_candidates(
        self, qvec: list[float], candidates: int, base: DataFrame | None = None
    ) -> DataFrame:
        """Compressed-domain first pass: integer dot over the stored int8
        codes (1 byte/dim — 4× fewer scan bytes than float32), ranked by
        qscore·qscale. Codes are x/scale·127, so the raw int dot is
        ∝ dot(a,q)/scale_a; multiplying back by the stored per-row scale
        removes the systematic under-ranking of large-max-component
        vectors. Only (doc_id, qscale, qvec) enter this plan — the float
        embedding column is never touched until the re-rank.
        FAISS SQ8+refine analog (the reference scans flat float32,
        /root/reference/src/langchain_memvid/index.py:144-148)."""
        qc = F.array(*[F.lit(c) for c in query_codes(qvec)])
        src = base if base is not None else self._doc_index
        return (
            src.select("doc_id", "qscale", "qvec")
            .withColumn("__qscore", int8_dot(F.col("qvec"), qc))
            .orderBy(
                (F.col("__qscore").cast("double") * F.col("qscale")).desc(),
                F.col("doc_id").asc(),
            )
            .limit(candidates)
            .select("doc_id")
        )

    def _metadata_predicate(self, filter: dict[str, Any]) -> F.Column:
        return metadata_predicate(filter, schema=self.metadata_schema)

    def _topk(
        self,
        qvec: list[float],
        k: int,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> DataFrame:
        """Pick the physical search strategy: direct exact scan, or int8
        first pass → exact re-rank of config.index.rerank_candidates
        when the corpus is big enough for two passes to win. l2 stays
        direct (the integer dot is a cosine/ip surrogate only).
        A metadata filter narrows the corpus before either strategy.

        With a trained IVF layout the corpus is FIRST pruned to the
        config.index.nprobe probed clusters — on the partitioned
        parquet layout the isin(probes) filter is a file-level
        PartitionFilter, so only nprobe/nlist of the corpus files are
        scanned; the int8 first pass then runs inside the probed
        partitions only. nprobe >= nlist probes everything (exact)."""
        return self._plan_topk(qvec, k, filter=filter, nprobe=nprobe)[0]

    def _plan_topk(
        self,
        qvec: list[float],
        k: int,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> tuple[DataFrame, str, str]:
        """_topk's body, returning (df, strategy, reason) so
        explain_search reports the EXACT decision the search paths
        execute — one decision site, no drifting duplicate planner."""
        base = self._doc_index
        strategy = "brute_force"
        why = []
        if self._ivf is not None:
            np_eff = min(
                nprobe if nprobe is not None else self.config.index.nprobe,
                len(self._ivf.centroids),
            )
            probes = self._ivf.probe_clusters(qvec, np_eff, metric=self._ivf_metric())
            base = base.filter(F.col("cluster_id").isin(probes))
            strategy = "ivf_pruned"
            why.append(
                f"IVF layout live: cluster_id IN {len(probes)} probes of "
                f"nlist={len(self._ivf.centroids)} prunes the scan at the file level"
            )
        else:
            why.append("no IVF layout (flat corpus): full scan")
        if filter:
            base = base.filter(self._metadata_predicate(filter))
            why.append("metadata filter applied before scoring")
        asc = self.config.index.metric == "l2"
        order = [
            F.col("similarity").asc() if asc else F.col("similarity").desc(),
            F.col("doc_id").asc(),
        ]
        q = F.array(*[F.lit(float(x)) for x in qvec])
        cand = self.config.index.rerank_candidates
        if self.config.index.metric != "l2" and 0 < cand < self._count:
            why.append(
                f"two-phase: int8 first pass keeps {max(cand, k)} candidates "
                f"(corpus={self._count} > rerank_candidates={cand}), floats read "
                "only for the exact re-rank"
            )
            cands = self._phase1_candidates(qvec, max(cand, k), base=base)
            scored = base.join(F.broadcast(cands), "doc_id").withColumn(
                "similarity", dot(F.col("embedding"), q)
            )
        elif self.config.index.metric == "l2":
            why.append("l2 metric: direct exact scan (int8 pass is a dot surrogate)")
            scored = base.withColumn("similarity", l2_sq(F.col("embedding"), q))
        else:
            why.append(
                f"direct exact scan (corpus={self._count}, "
                f"rerank_candidates={cand}: two passes would not pay)"
            )
            scored = base.withColumn("similarity", dot(F.col("embedding"), q))
        return scored.orderBy(*order).limit(k), strategy, "; ".join(why)

    def explain_search(
        self,
        query: str | None = None,
        *,
        qvec: list[float] | None = None,
        k: int = 4,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ):
        """The dispatch EXPLAINER (VERDICT r7 item 8): returns the
        AnnPlan (strategy, reason, df) for exactly the physical search
        similarity_search would run — so a 100 TB operator can see WHY
        a query scanned what it scanned (which clusters pruned, whether
        the int8 first pass engaged) without reverse-engineering
        `df.explain` output.  `strategy` is "ivf_pruned" iff the plan
        carries the file-level PartitionFilters prune; the df is the
        live plan (call .explain()/.collect() on it as usual).

        Pass a text ``query`` (embedded with the store's model) or a
        raw ``qvec`` (normalized under the store's metric)."""
        from langchain_memvid_spark.plans.ann_planner import AnnPlan

        if (query is None) == (qvec is None):
            raise ValueError("pass exactly one of query= or qvec=")
        v = self._query_vec(query) if query is not None else self._normalize_query(qvec)
        df, strategy, reason = self._plan_topk(v, k, filter=filter, nprobe=nprobe)
        return AnnPlan(strategy, reason, df)

    def _query_vec(self, query: str) -> list[float]:
        """Embed a query and apply the metric's normalization — the ONE
        place text search paths get their query vector."""
        return self._normalize_query(self.embeddings.embed_query(query))

    def _normalize_query(self, qvec: list[float]) -> list[float]:
        """Apply the metric's normalization to a raw query vector — the
        ONE place any search path (text or by-vector) normalizes, so a
        new metric cannot diverge between entry points.  Without this
        the by-vector entry points would return cosine 'similarities'
        scaled by |query| (outside [-1, 1] for non-unit embedding
        models) while the text path returns true cosine."""
        qvec = [float(x) for x in qvec]
        if self.config.index.metric == "cosine":
            import math

            n = math.sqrt(sum(x * x for x in qvec)) or 1.0
            qvec = [x / n for x in qvec]
        return qvec

    def similarity_search_with_score(
        self,
        query: str,
        k: int = 4,
        include_full_metadata: bool = False,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[tuple[dict[str, Any], float]]:
        """≙ vectorstore.py:659-684. Broadcast query vector → JVM-side
        dot product → TakeOrderedAndProject top-k (no full sort).

        ``filter`` (LangChain-standard, beyond the reference) restricts
        the search to rows whose metadata equals every given key/value
        — applied BEFORE scoring, so on a filter column that is part of
        the table layout the predicate prunes the scan rather than
        post-filtering the top-k (which would under-fill k)."""
        return self._search_vec_with_score(
            self._query_vec(query), k, include_full_metadata, filter=filter, nprobe=nprobe
        )

    def _search_vec_with_score(
        self,
        embedding: list[float],
        k: int = 4,
        include_full_metadata: bool = False,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[tuple[dict[str, Any], float]]:
        """Shared vector-query search body (text and by-vector entry
        points both land here). ``nprobe`` overrides the configured
        probe count for THIS call on IVF stores (more probes = higher
        recall, more files scanned); ignored on flat stores."""
        if self._count == 0:
            return []
        top = self._topk(embedding, k, filter=filter, nprobe=nprobe)
        if include_full_metadata:
            top = top.join(self._payload, "doc_id", "left")
        out = []
        for r in top.collect():
            meta = json.loads(r["metadata_json"] or "{}")
            meta["similarity"] = r["similarity"]
            meta["metadata_type"] = "essential"
            if include_full_metadata and r["payload_json"] is not None:
                full = json.loads(r["payload_json"])
                inner = json.loads(full.get("metadata") or "{}")
                meta.update(inner)
                meta["metadata_type"] = "full"
            doc = {"page_content": r["text"], "metadata": meta, "doc_id": r["doc_id"]}
            out.append((doc, float(r["similarity"])))
        return out

    def similarity_search(
        self,
        query: str,
        k: int = 4,
        include_full_metadata: bool = False,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[dict[str, Any]]:
        """≙ vectorstore.py:602-634."""
        return [
            d
            for d, _ in self.similarity_search_with_score(
                query, k, include_full_metadata, filter=filter, nprobe=nprobe
            )
        ]

    def similarity_search_by_vector(
        self,
        embedding: list[float],
        k: int = 4,
        include_full_metadata: bool = False,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[dict[str, Any]]:
        """LangChain-standard by-vector entry point (upstream
        VectorStore contract; the reference omits it — its search is
        text-only, vectorstore.py:602-634): identical to
        similarity_search minus the query-embedding step, so a caller
        holding precomputed vectors skips the embed."""
        return [
            d
            for d, _ in self._search_vec_with_score(
                self._normalize_query(embedding), k, include_full_metadata,
                filter=filter, nprobe=nprobe,
            )
        ]

    def search_text(self, query: str, k: int = 4) -> list[SearchResult]:
        """≙ IndexManager.search_text (index.py:309-338)."""
        out = []
        for doc, score in self.similarity_search_with_score(query, k):
            meta = doc["metadata"]
            out.append(
                SearchResult(
                    text=doc["page_content"],
                    source=meta.get("source"),
                    category=meta.get("category"),
                    similarity=score,
                    metadata=meta,
                )
            )
        return out

    def batch_search(self, queries: list[str], k: int = 4) -> DataFrame:
        """All queries in ONE scored join — replaces the reference's
        sequential per-query loop (retriever.py:110-136). Queries side
        is broadcast; per-query top-k via window row_number.

        When the corpus exceeds config.index.rerank_candidates (and the
        metric is cosine/ip), the join runs two-phase like the single-
        query path: phase 1 scores every (doc, query) pair on the stored
        1-byte int8 codes (ranked by qscore·qscale, debiased) and keeps
        the top candidates per query; only those (query, doc) pairs
        touch the float column for the exact re-rank. The heavy
        all-pairs pass scans 4× fewer bytes — at 100 TB that is the
        difference between scanning the corpus once in codes vs once in
        floats per query batch.

        Returns DataFrame(query_id, doc_id, text, similarity, rank)."""
        return self._plan_batch_search(queries, k)[0]

    def explain_batch_search(self, queries: list[str], k: int = 4):
        """batch_search's dispatch EXPLAINER (VERDICT r8 item 6 — the
        100 TB operator debugging a batch job needs the same AnnPlan
        visibility the single-query path has): returns (strategy,
        reason, df) for exactly the physical plan batch_search would
        run — how many clusters the probe UNION pruned to, and whether
        the int8 first pass engaged."""
        from langchain_memvid_spark.plans.ann_planner import AnnPlan

        df, strategy, reason = self._plan_batch_search(queries, k)
        return AnnPlan(strategy, reason, df)

    def _plan_batch_search(
        self, queries: list[str], k: int
    ) -> tuple[DataFrame, str, str]:
        """batch_search's body, returning (df, strategy, reason) — one
        decision site shared with the explainer (the _plan_topk
        pattern)."""
        strategy, why = "brute_force", []
        qrows = []
        for qid, qtext in enumerate(queries):
            v = self._query_vec(qtext)
            qrows.append((qid, qtext, [float(x) for x in v], query_codes(v)))
        # __qv/__qc, not "qvec": the doc_index carries its own qvec (int8
        # codes) column, and an unqualified name would be AMBIGUOUS after
        # the join. Project the index down to the columns each phase
        # needs so the payload columns never enter the join at all.
        qdf = self.spark.createDataFrame(
            qrows, "query_id LONG, query STRING, __qv ARRAY<DOUBLE>, __qc ARRAY<INT>"
        )
        # IVF layout: prune the scan to the UNION of every query's
        # probed clusters — the batch still reads only probed files
        # (per-query probe restriction would shave a little more work
        # but not bytes; the union IS the byte bound).
        corpus = self._doc_index
        if self._ivf is not None:
            nprobe = min(self.config.index.nprobe, len(self._ivf.centroids))
            all_probes = sorted(
                {
                    cid
                    for _, _, v, _ in qrows
                    for cid in self._ivf.probe_clusters(
                        v, nprobe, metric=self._ivf_metric()
                    )
                }
            )
            corpus = corpus.filter(F.col("cluster_id").isin(all_probes))
            strategy = "ivf_pruned"
            why.append(
                f"IVF layout live: union of {len(qrows)} queries' probes = "
                f"{len(all_probes)} clusters of nlist={len(self._ivf.centroids)} "
                "prunes the scan at the file level"
            )
        else:
            why.append("no IVF layout (flat corpus): full scan")
        cand = self.config.index.rerank_candidates
        if self.config.index.metric != "l2" and 0 < cand < self._count:
            why.append(
                f"two-phase: int8 first pass keeps {max(cand, k)} candidates "
                f"per query (corpus={self._count} > rerank_candidates={cand}), "
                "floats read only for the exact re-rank"
            )
            codes = corpus.select("doc_id", "qscale", "qvec")
            p1 = (
                codes.crossJoin(F.broadcast(qdf.select("query_id", "__qc")))
                .withColumn("__qscore", int8_dot(F.col("qvec"), F.col("__qc")))
            )
            w1 = Window.partitionBy("query_id").orderBy(
                (F.col("__qscore").cast("double") * F.col("qscale")).desc(),
                F.col("doc_id").asc(),
            )
            cands = (
                p1.withColumn("__r", F.row_number().over(w1))
                .filter(F.col("__r") <= max(cand, k))
                .select("query_id", "doc_id")
            )
            docs = corpus.select("doc_id", "text", "embedding")
            joined = (
                docs.join(F.broadcast(cands), "doc_id")
                .join(F.broadcast(qdf), "query_id")
            )
        else:
            if self.config.index.metric == "l2":
                why.append(
                    "l2 metric: direct exact scan (int8 pass is a dot surrogate)"
                )
            else:
                why.append(
                    f"direct exact scan (corpus={self._count}, "
                    f"rerank_candidates={cand}: two passes would not pay)"
                )
            docs = corpus.select("doc_id", "text", "embedding")
            joined = docs.crossJoin(F.broadcast(qdf))
        why.append(f"query side ({len(qrows)} rows) broadcast")
        if self.config.index.metric == "l2":
            scored = joined.withColumn("similarity", l2_sq(F.col("embedding"), F.col("__qv")))
            order = [F.col("similarity").asc(), F.col("doc_id").asc()]
        else:
            scored = joined.withColumn("similarity", dot(F.col("embedding"), F.col("__qv")))
            order = [F.col("similarity").desc(), F.col("doc_id").asc()]
        w = Window.partitionBy("query_id").orderBy(*order)
        df = (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "query", "doc_id", "text", "similarity", "rank")
        )
        return df, strategy, "; ".join(why)

    def similarity_join(
        self,
        queries: DataFrame,
        k: int = 4,
        query_id_col: str = "query_id",
        query_vec_col: str = "embedding",
        n_queries: int | None = None,
    ) -> DataFrame:
        """Corpus-scale batch ANN over a QUERY TABLE: every row of
        ``queries`` gets its top-k most similar stored documents —
        batch_search without the driver-side collect, for query sets
        that are themselves tables (dedup a new corpus against the
        store, link every incoming doc to its exemplars).

        With a live IVF layout each query row is assigned its
        top-nprobe clusters JVM-side via the store's OWN centroids
        (literal-inlined top-p argmax, core/ivf.py — no retrain, no
        collect of the query table); the distinct probed set (≤ nlist
        ints, one tiny aggregate) prunes the corpus scan at the FILE
        level, and the cluster_id equi-join bounds pair work to
        ~nprobe/nlist of the corpus per query.  Docs carry ONE argmax
        cluster, so a (query, doc) pair joins at most once — no
        dedupe stage.  The join picks broadcast vs SMJ from an exact
        query count (pass ``n_queries`` to skip the eager count).

        Without a layout the unpruned crossJoin is allowed only for
        broadcastable query tables; a corpus-sized query table against
        an unclustered corpus RAISES (enable IndexConfig.ivf) rather
        than silently launching the N·M scan.

        Returns DataFrame(query_id, doc_id, text, similarity, rank) —
        similarity in the store's metric (dot for cosine/ip over the
        ingest-normalized corpus, squared L2 ascending for l2).
        """
        return self._plan_similarity_join(
            queries, k, query_id_col, query_vec_col, n_queries
        )[0]

    def explain_similarity_join(
        self,
        queries: DataFrame,
        k: int = 4,
        query_id_col: str = "query_id",
        query_vec_col: str = "embedding",
        n_queries: int | None = None,
    ):
        """similarity_join's dispatch EXPLAINER (VERDICT r8 item 6):
        returns the AnnPlan (strategy, reason, df) for exactly the
        physical plan similarity_join would run — the probed cluster
        count and the query-side kernel pick (broadcast vs sort-merge,
        from the exact query count)."""
        from langchain_memvid_spark.plans.ann_planner import AnnPlan

        df, strategy, reason = self._plan_similarity_join(
            queries, k, query_id_col, query_vec_col, n_queries
        )
        return AnnPlan(strategy, reason, df)

    def _plan_similarity_join(
        self,
        queries: DataFrame,
        k: int,
        query_id_col: str,
        query_vec_col: str,
        n_queries: int | None,
    ) -> tuple[DataFrame, str, str]:
        """similarity_join's body, returning (df, strategy, reason) —
        one decision site shared with the explainer."""
        from langchain_memvid_spark.operators.dedup import _PAIR_BROADCAST_ROW_LIMIT

        strategy, why = "brute_force", []
        metric = self.config.index.metric
        qv = F.col(query_vec_col).cast("array<double>")
        if metric == "cosine":
            qv = l2_normalize(qv)
        if n_queries is None:
            n_queries = queries.count()
        corpus = self._doc_index
        if self._ivf is not None:
            from langchain_memvid_spark.core.ivf import top_clusters_col

            nprobe = min(self.config.index.nprobe, len(self._ivf.centroids))
            qdf = queries.select(
                F.col(query_id_col).alias("query_id"),
                qv.alias("__qv"),
                top_clusters_col(
                    qv, self._ivf.centroids, nprobe, metric=self._ivf_metric()
                ).alias("__probes"),
                # assignment feeds BOTH the probe-set aggregate and the
                # join — materialize once
            ).localCheckpoint()
            probed = sorted(
                r["c"]
                for r in qdf.select(F.explode("__probes").alias("c")).distinct().collect()
            )
            corpus = corpus.filter(F.col("cluster_id").isin(probed))
            strategy = "ivf_pruned"
            why.append(
                f"IVF layout live: {n_queries} query rows assigned JVM-side, "
                f"distinct probe set = {len(probed)} clusters of "
                f"nlist={len(self._ivf.centroids)} prunes the scan at the file level"
            )
            qx = qdf.select("query_id", "__qv", F.explode("__probes").alias("cluster_id"))
            if n_queries * nprobe <= _PAIR_BROADCAST_ROW_LIMIT:
                right = F.broadcast(qx)
                why.append(
                    f"query side broadcast ({n_queries}×{nprobe} probe rows "
                    f"≤ {_PAIR_BROADCAST_ROW_LIMIT})"
                )
            else:
                right = qx.hint("merge")
                why.append(
                    f"query side sort-merge ({n_queries}×{nprobe} probe rows "
                    f"> {_PAIR_BROADCAST_ROW_LIMIT}: too big to broadcast)"
                )
            joined = corpus.select("doc_id", "embedding", "cluster_id").join(
                right, "cluster_id"
            )
        else:
            if n_queries > _PAIR_BROADCAST_ROW_LIMIT:
                raise ValueError(
                    f"similarity_join: {n_queries} query rows against an "
                    "unclustered corpus would be an unpruned cross join. "
                    "Enable the IVF layout (IndexConfig.ivf) so the probe "
                    "assignment can bound the pair space, or batch the "
                    "queries below the broadcast limit."
                )
            qdf = queries.select(F.col(query_id_col).alias("query_id"), qv.alias("__qv"))
            joined = self._doc_index.select("doc_id", "embedding").crossJoin(
                F.broadcast(qdf)
            )
            why.append(
                f"no IVF layout (flat corpus): full scan, query side "
                f"broadcast ({n_queries} rows ≤ {_PAIR_BROADCAST_ROW_LIMIT})"
            )
        if metric == "l2":
            scored = joined.withColumn(
                "similarity", l2_sq(F.col("embedding"), F.col("__qv"))
            )
            order = [F.col("similarity").asc(), F.col("doc_id").asc()]
        else:
            scored = joined.withColumn("similarity", dot(F.col("embedding"), F.col("__qv")))
            order = [F.col("similarity").desc(), F.col("doc_id").asc()]
        w = Window.partitionBy("query_id").orderBy(*order)
        top = (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "similarity", "rank")
        )
        # text lookup from the PRUNED corpus frame (the top-k docs are
        # within the probed set by construction) — joining against the
        # full doc_index here would silently re-scan every file's
        # doc_id/text columns, defeating the probe pruning
        texts = corpus.select("doc_id", "text")
        top_side = (
            F.broadcast(top) if n_queries * k <= _PAIR_BROADCAST_ROW_LIMIT else top
        )
        df = texts.join(top_side, "doc_id").select(
            "query_id", "doc_id", "text", "similarity", "rank"
        )
        return df, strategy, "; ".join(why)

    def similarity_search_with_relevance_scores(
        self,
        query: str,
        k: int = 4,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[tuple[dict[str, Any], float]]:
        """LangChain-standard normalized relevance in [0, 1]: cosine
        maps via (1+sim)/2 clamped, l2 via 1/(1+d²), ip via a sigmoid —
        the unnormalized dot is unbounded, so the affine cosine map
        would pile scores onto the clamped endpoints and destroy
        ordering (ADVICE r4 #4). (Beyond the reference, which returns
        raw FAISS scores only — vectorstore.py:659-684.)

        The map is computed IN-PLAN from the SHARED Catalyst expression
        (functions.vector.relevance_score_col) that the oracle-checked
        vs_relevance_scores query also builds from, so the driver hash
        pins the exact map this API returns."""
        from langchain_memvid_spark.functions.vector import relevance_score_col

        if self._count == 0:
            return []
        top = self._topk(self._query_vec(query), k, filter=filter, nprobe=nprobe).withColumn(
            "__rel",
            relevance_score_col(
                F.col("similarity").cast("double"), self.config.index.metric
            ),
        )
        out = []
        for r in top.collect():
            meta = json.loads(r["metadata_json"] or "{}")
            meta["similarity"] = r["similarity"]
            meta["metadata_type"] = "essential"
            doc = {"page_content": r["text"], "metadata": meta, "doc_id": r["doc_id"]}
            out.append((doc, float(r["__rel"])))
        return out

    def max_marginal_relevance_search(
        self,
        query: str,
        k: int = 4,
        fetch_k: int = 20,
        lambda_mult: float = 0.5,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[dict[str, Any]]:
        """MMR re-ranking (LangChain-standard, beyond the reference):
        fetch the top `fetch_k` candidates with the distributed
        (two-phase when large) search, then greedily pick k docs
        maximizing λ·sim(query, d) − (1−λ)·max sim(d, selected).

        The O(fetch_k²) greedy step runs driver-side on the collected
        candidate vectors — bounded by fetch_k (a user knob ≪ corpus),
        NOT corpus size, so the distributed part stays the heavy part.
        ``filter`` narrows the candidate fetch BEFORE scoring (same
        pre-scoring predicate as similarity_search)."""
        return self.max_marginal_relevance_search_by_vector(
            self._query_vec(query), k, fetch_k, lambda_mult, filter=filter, nprobe=nprobe
        )

    def max_marginal_relevance_search_by_vector(
        self,
        embedding: list[float],
        k: int = 4,
        fetch_k: int = 20,
        lambda_mult: float = 0.5,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[dict[str, Any]]:
        """MMR with a precomputed query vector (upstream VectorStore
        contract) — the text entry point minus the embed step."""
        if self._count == 0:
            return []
        qvec = self._normalize_query(embedding)
        cand_rows = self._topk(qvec, max(fetch_k, k), filter=filter, nprobe=nprobe).collect()
        if not cand_rows:
            return []
        # shared greedy (operators/topk.py greedy_mmr): the SAME loop
        # the oracle-checked mmr_search query pins, so the store API
        # cannot silently diverge from the driver-verified selection.
        # _topk rows arrive sorted by the metric order with doc_id
        # tie-breaks; qsim is re-derived as cosine over the candidate
        # frame (metric-independent diversity term needs unit vectors
        # anyway, and for cosine/ip stores the candidate order is
        # already the qsim order greedy_mmr expects).
        from langchain_memvid_spark.operators.topk import greedy_mmr

        import math

        def _cosq(v: list[float]) -> float:
            d = sum(a * b for a, b in zip(v, qvec))
            nv = math.sqrt(sum(a * a for a in v)) or 1.0
            nq = math.sqrt(sum(a * a for a in qvec)) or 1.0
            return d / (nv * nq)

        vecs = [[float(x) for x in r["embedding"]] for r in cand_rows]
        ids = [r["doc_id"] for r in cand_rows]
        qsim = [_cosq(v) for v in vecs]
        selected = greedy_mmr(vecs, qsim, ids, k, lambda_mult)
        out = []
        for i in selected:
            r = cand_rows[i]
            meta = json.loads(r["metadata_json"] or "{}")
            meta["metadata_type"] = "essential"
            out.append({"page_content": r["text"], "metadata": meta, "doc_id": r["doc_id"]})
        return out

    def hybrid_search(
        self,
        query: str,
        k: int = 4,
        fetch_k: int = 20,
        rrf_k: int = 60,
    ) -> list[dict[str, Any]]:
        """Lexical (BM25 over the stored text) ∪ vector similarity,
        fused by reciprocal rank fusion: score = Σ 1/(rrf_k + rank)
        over the two top-`fetch_k` rankings. Beyond the reference,
        which searches vectors only (index.py:309-338) — a query whose
        exact keywords matter ("error E1234") ranks lexical hits the
        embedding may miss.

        The query is whitespace-tokenized into BM25 terms with the
        same convention the corpus side uses; both rankings are
        distributed (the vector side two-phase over int8 codes when
        large), and the fuse is a bounded full-outer join."""
        if self._count == 0:
            return []
        from langchain_memvid_spark.operators.ranking import bm25_topk, rrf_fuse

        terms = tuple(dict.fromkeys(query.split()))
        if not terms:
            return []
        n = max(fetch_k, k)
        text_ranked = bm25_topk(
            self._doc_index.select("doc_id", "text"), query_terms=terms, k=n
        )
        qvec = self._query_vec(query)
        asc = self.config.index.metric == "l2"
        vw = Window.orderBy(
            F.col("similarity").asc() if asc else F.col("similarity").desc(),
            F.col("doc_id").asc(),
        )
        vec_ranked = (
            self._topk(qvec, n)
            .select("doc_id", "similarity")
            .withColumn("rank", F.row_number().over(vw).cast("int"))
        )
        fused = rrf_fuse(text_ranked, vec_ranked, k=k, rrf_k=rrf_k)
        rows = (
            fused.join(self._doc_index.select("doc_id", "text", "metadata_json"), "doc_id")
            .orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
            .collect()
        )
        out = []
        for r in rows:
            meta = json.loads(r["metadata_json"] or "{}")
            meta["metadata_type"] = "essential"
            meta["rrf_score"] = float(r["rrf"])
            out.append({"page_content": r["text"], "metadata": meta, "doc_id": r["doc_id"]})
        return out

    def as_retriever(
        self,
        k: int = 4,
        frame_cache_size: int = 100,
        search_type: str = "similarity",
        search_kwargs: dict[str, Any] | None = None,
    ):
        """LangChain-convention retriever factory ≙ the reference's
        lazy ``retriever`` property (vectorstore.py:147-172), explicit
        instead of implicit. ``search_type``/``search_kwargs`` follow
        the upstream contract (similarity / mmr /
        similarity_score_threshold); ``search_kwargs={"k": n}`` also
        respected for upstream-shaped callers."""
        from langchain_memvid_spark.core.retriever import SparkRetriever

        # search_kwargs={'k': n} handling lives in SparkRetriever
        # itself, so direct construction honors it identically
        return SparkRetriever(
            self,
            k=k,
            frame_cache_size=frame_cache_size,
            search_type=search_type,
            search_kwargs=search_kwargs,
        )

    # ------------------------------------------------------------ point lookups

    def get_document_by_id(self, doc_id: int | str, include_full_metadata: bool = False):
        """≙ retriever.py:258-316 — filter pushdown point lookup."""
        docs = self.get_documents_by_ids([doc_id], include_full_metadata)
        return docs[0] if docs else None

    def get_documents_by_ids(
        self, doc_ids: list[int | str], include_full_metadata: bool = False
    ) -> list[dict[str, Any]]:
        """≙ retriever.py:372-394 — one semi-join, not a per-id loop."""
        try:
            ids = [int(d) for d in doc_ids]
        except (TypeError, ValueError) as e:
            raise RetrievalError(f"invalid doc ids {doc_ids!r}") from e
        df = self._filter_ids(self._doc_index, ids, keep=True)
        if include_full_metadata:
            df = df.join(self._payload, "doc_id", "left")
        out = []
        for r in df.orderBy("doc_id").collect():
            meta = json.loads(r["metadata_json"] or "{}")
            meta["metadata_type"] = "essential"
            if include_full_metadata and r["payload_json"] is not None:
                full = json.loads(r["payload_json"])
                meta.update(json.loads(full.get("metadata") or "{}"))
                meta["metadata_type"] = "full"
            out.append({"page_content": r["text"], "metadata": meta, "doc_id": r["doc_id"]})
        return out

    def get_all_documents(self) -> list[dict[str, Any]]:
        """≙ index.py:442-456 full scan."""
        return [
            {"page_content": r["text"], "metadata": json.loads(r["metadata_json"] or "{}"), "doc_id": r["doc_id"]}
            for r in self._doc_index.orderBy("doc_id").collect()
        ]

    def get_document_count(self) -> int:
        return self._count

    # ---------------------------------------------------------------- deletes

    def _renumber(self) -> None:
        """Reassign ids 0..n-1 after delete, mirroring index.py:433-435.
        No re-embedding (the reference only re-embeds because FAISS flat
        lacks remove-by-id — SURVEY.md §4 defect 1).

        Id compaction is the two-phase offset pattern over a range
        partitioning of the surviving ids (core/ids.py) — no global
        single-reducer window; survives a 100x corpus."""
        n_parts = max(1, self.spark.sparkContext.defaultParallelism)
        old_new = add_sequential_ids(
            self._doc_index.select("doc_id").repartitionByRange(n_parts, "doc_id"),
            id_col="__new_id",
            order_col="doc_id",
            start=0,
        )
        old_index, old_payload = self._doc_index, self._payload
        idx_cols = [
            "doc_id", "text", "source", "category", "metadata_json",
            "metadata_hash", "embedding", "qscale", "qvec", "pscale", "pvec",
            *_MH_COLS,
        ]
        if self._ivf is not None:
            idx_cols.append("cluster_id")  # assignments survive deletes
        renumbered = (
            self._doc_index.join(old_new, "doc_id")
            .drop("doc_id")
            .withColumnRenamed("__new_id", "doc_id")
            .select(*idx_cols)
        )
        if self._ivf is not None:
            # rewrite the partitioned layout under the new ids
            # (overwrite-swap into the next version dir — the derived
            # plan reads the OLD files while writing the new ones)
            self._swap_layout(renumbered)
        else:
            self._doc_index = renumbered.cache()
        self._payload = (
            self._payload.join(old_new, "doc_id")
            .drop("doc_id")
            .withColumnRenamed("__new_id", "doc_id")
            .select("doc_id", "payload_json")
            .cache()
        )
        self._count = self._doc_index.count()
        self._payload.count()
        old_index.unpersist()
        old_payload.unpersist()
        self._maybe_truncate_lineage()

    def delete_by_ids(self, doc_ids: list[int | str]) -> bool:
        """≙ vectorstore.py:290-352 / index.py:347-376: validate, anti-join
        both tables, renumber. 'Frame removal' is just row deletion."""
        if not doc_ids:
            # reference raises, not a silent no-op (vectorstore.py:310)
            raise ValueError("No document IDs provided to delete")
        try:
            ids = [int(d) for d in doc_ids]
        except (TypeError, ValueError) as e:
            raise IndexError_(f"invalid doc ids {doc_ids!r}") from e
        bad = [i for i in ids if i < 0 or i >= self._count]
        if bad:
            raise IndexError_(f"doc ids out of range: {bad}")
        # hold the CACHED pre-delete tables: the reassignment below
        # replaces them with derived (uncached) filter plans, so
        # _renumber's own unpersist would no-op and leak one cache
        # entry per table per delete
        old_index, old_payload = self._doc_index, self._payload
        self._doc_index = self._filter_ids(self._doc_index, ids, keep=False)
        self._payload = self._filter_ids(self._payload, ids, keep=False)
        self._renumber()
        old_index.unpersist()
        old_payload.unpersist()
        return True

    # A literal isin() embeds every id in the plan — fine for a handful,
    # pathological for bulk deletes (expression-tree size, codegen).
    # Past this count the ids become a broadcast (semi/anti) join input.
    _ISIN_LIMIT = 1000

    def _filter_ids(self, df: DataFrame, ids: list[int], keep: bool) -> DataFrame:
        if len(ids) <= self._ISIN_LIMIT:
            cond = F.col("doc_id").isin(ids)
            return df.filter(cond if keep else ~cond)
        ids_df = self.spark.createDataFrame([(i,) for i in ids], "doc_id LONG").dropDuplicates()
        return df.join(F.broadcast(ids_df), "doc_id", "left_semi" if keep else "left_anti")

    def delete_by_texts(self, texts: list[str]) -> bool:
        """≙ index.py:378-402 — FIRST occurrence only per text:
        row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1.
        Returns False when no text matched any document, mirroring the
        reference (index.py:389-397)."""
        if not texts:
            # reference raises, not a silent no-op (vectorstore.py:368)
            raise ValueError("No texts provided to delete")
        tdf = self.spark.createDataFrame([(t,) for t in texts], "text STRING").dropDuplicates()
        w = Window.partitionBy("text").orderBy("doc_id")
        victims = (
            self._doc_index.join(F.broadcast(tdf), "text", "left_semi")
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("doc_id")
            .localCheckpoint()  # materialized once; reclaimed on GC
        )
        if not victims.head(1):
            return False
        old_index, old_payload = self._doc_index, self._payload
        self._doc_index = self._doc_index.join(victims, "doc_id", "left_anti")
        self._payload = self._payload.join(victims, "doc_id", "left_anti")
        self._renumber()
        old_index.unpersist()
        old_payload.unpersist()
        return True

    def delete_documents(self, documents: Iterable[Any]) -> bool:
        texts = [d.page_content if hasattr(d, "page_content") else d["text"] for d in documents]
        return self.delete_by_texts(texts)

    # LangChain's modern VectorStore ABC spells these `delete` /
    # `get_by_ids`; the engine names match the reference
    # (vectorstore.py:290,749). Aliases complete the drop-in story.
    def delete(self, ids: list[int | str] | None = None, **kwargs: Any) -> bool:
        if ids is None:
            raise IndexError_("delete() requires explicit ids; refusing delete-all")
        return self.delete_by_ids(ids)

    def get_by_ids(self, ids: list[int | str]) -> list[dict[str, Any]]:
        return self.get_documents_by_ids(ids)

    # ------------------------------------------------------------------ async
    # Store-level async parity with the reference
    # (/root/reference/src/langchain_memvid/vectorstore.py:227-252,
    # 636-657,686-707,418-467). Spark actions block a thread, so these
    # are run_in_executor wrappers — same pattern the reference uses
    # (its async methods delegate to the sync implementations), but
    # actually off the event loop instead of blocking it.

    async def _to_thread(self, fn, *args, **kwargs):
        import asyncio
        from functools import partial

        return await asyncio.get_running_loop().run_in_executor(
            None, partial(fn, *args, **kwargs)
        )

    async def aadd_texts(
        self, texts: list[str], metadatas: list[dict[str, Any]] | None = None
    ) -> list[str]:
        return await self._to_thread(self.add_texts, texts, metadatas)

    async def aadd_documents(self, documents: Iterable[Any]) -> list[str]:
        return await self._to_thread(self.add_documents, documents)

    async def asimilarity_search(
        self,
        query: str,
        k: int = 4,
        include_full_metadata: bool = False,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[dict[str, Any]]:
        return await self._to_thread(
            self.similarity_search,
            query,
            k,
            include_full_metadata,
            filter=filter,
            nprobe=nprobe,
        )

    async def asimilarity_search_with_score(
        self,
        query: str,
        k: int = 4,
        include_full_metadata: bool = False,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[tuple[dict[str, Any], float]]:
        return await self._to_thread(
            self.similarity_search_with_score,
            query,
            k,
            include_full_metadata,
            filter=filter,
            nprobe=nprobe,
        )

    async def adelete_by_ids(self, doc_ids: list[int | str]) -> bool:
        return await self._to_thread(self.delete_by_ids, doc_ids)

    async def adelete_by_texts(self, texts: list[str]) -> bool:
        return await self._to_thread(self.delete_by_texts, texts)

    async def adelete(self, ids: list[int | str] | None = None, **kwargs: Any) -> bool:
        return await self._to_thread(self.delete, ids, **kwargs)

    async def aget_by_ids(self, ids: list[int | str]) -> list[dict[str, Any]]:
        return await self._to_thread(self.get_by_ids, ids)

    async def asimilarity_search_by_vector(
        self,
        embedding: list[float],
        k: int = 4,
        include_full_metadata: bool = False,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[dict[str, Any]]:
        return await self._to_thread(
            self.similarity_search_by_vector,
            embedding,
            k,
            include_full_metadata,
            filter=filter,
            nprobe=nprobe,
        )

    async def amax_marginal_relevance_search(
        self,
        query: str,
        k: int = 4,
        fetch_k: int = 20,
        lambda_mult: float = 0.5,
        filter: dict[str, Any] | None = None,
        nprobe: int | None = None,
    ) -> list[dict[str, Any]]:
        return await self._to_thread(
            self.max_marginal_relevance_search,
            query,
            k,
            fetch_k,
            lambda_mult,
            filter=filter,
            nprobe=nprobe,
        )

    # ------------------------------------------------------------------ stats

    def get_storage_stats(self) -> StorageStats:
        """≙ vectorstore.py:815-879 but with REAL aggregates (the
        reference hard-codes size heuristics, :858-859)."""
        idx_bytes = int(
            self._doc_index.select(
                F.sum(
                    F.length(F.col("text"))
                    + F.coalesce(F.length("metadata_json"), F.lit(0))
                    + F.size("embedding") * 4
                    # int8 codes: 1 byte/dim + 8-byte per-row scale
                    + F.coalesce(F.size("qvec"), F.lit(0)) + 8
                    + 72
                ).alias("b")
            ).collect()[0]["b"]
            or 0
        )
        pay_bytes = int(
            self._payload.select(F.sum(F.length("payload_json")).alias("b")).collect()[0]["b"] or 0
        )
        return StorageStats(
            document_count=self._count,
            index_bytes=idx_bytes,
            payload_bytes=pay_bytes,
            frame_mapping_count=self._count,
        )

    # ---------------------------------------------------------------- persist

    def save(self, path: str) -> None:
        """≙ IndexManager.save (index.py:609-635) — both tables to
        Parquet. Overwrite-swap semantics like the reference's file swap
        (vectorstore.py:579-581). Note that after load(), an IVF
        store's appends write INTO the loaded doc_index directory —
        the saved path IS the live layout for the loaded store.

        With a trained IVF layout the doc_index is written
        partitionBy(cluster_id) and the centroids go to a tiny
        `ivf_centroids` parquet alongside, so load() restores the
        partition-pruned search path — the layout survives the
        round-trip instead of degrading to a flat scan."""
        try:
            w = self._doc_index.write.mode("overwrite")
            if self._ivf is not None:
                w = w.partitionBy("cluster_id")
                cents = self.spark.createDataFrame(
                    [(cid, [float(x) for x in c]) for cid, c in self._ivf.centroids],
                    "cluster_id INT, centroid ARRAY<DOUBLE>",
                )
                cents.coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(path, "ivf_centroids")
                )
            w.parquet(os.path.join(path, "doc_index"))
            self._payload.write.mode("overwrite").parquet(os.path.join(path, "payload"))
        except Exception as e:  # pragma: no cover
            raise StorageError(f"save to {path} failed: {e}") from e

    @classmethod
    def load(
        cls,
        path: str,
        spark: SparkSession,
        embeddings: Any | None = None,
        config: EngineConfig | None = None,
    ) -> "SparkVectorStore":
        """≙ IndexManager.load (index.py:637-670)."""
        store = cls(spark, embeddings=embeddings, config=config)
        try:
            idx_path = os.path.join(path, "doc_index")
            idx = spark.read.parquet(idx_path)
            physical = set(idx.columns)
            if "qvec" not in idx.columns:
                # store saved before the int8 code columns existed:
                # backfill codes from the stored float vectors so appends
                # (unionByName) and the compressed first pass keep working
                qscale, qvec = quantize_cols(F.col("embedding"))
                idx = idx.withColumn("qscale", qscale).withColumn("qvec", qvec)
            if "pvec" not in idx.columns:
                # pre-r7 save: backfill the packed int4 tier the same way
                pscale, pvec = quantize4_cols(F.col("embedding"))
                idx = idx.withColumn("pscale", pscale).withColumn("pvec", pvec)
            if "mh0" not in idx.columns:
                # pre-signature save: sign the corpus ONCE at load (a
                # mapInPandas + join, not a column expression — the one
                # legacy backfill that costs a shuffle) so the near-dup
                # ingest gate has stored signatures to anti-join
                from langchain_memvid_spark.operators.dedup import minhash_signatures

                idx = idx.join(
                    minhash_signatures(idx.select("doc_id", "text")), "doc_id", "left"
                )
            cents_path = os.path.join(path, "ivf_centroids")
            cents_rows = None
            if "cluster_id" in idx.columns:
                # probe for the centroids table THROUGH Spark, not
                # os.path: the save/load path is a shared filesystem on
                # a real cluster (HDFS/S3), where a driver-local isdir
                # is always False and would silently degrade the loaded
                # store to a flat full scan
                try:
                    cents_rows = spark.read.parquet(cents_path).collect()
                except AnalysisException as e:
                    cond = (
                        e.getCondition()
                        if hasattr(e, "getCondition")
                        else e.getErrorClass()
                    )
                    if cond != "PATH_NOT_FOUND":
                        # a PRESENT but unreadable centroids table is
                        # corruption — fail loudly (outer StorageError)
                        # rather than silently degrading to a flat scan
                        raise
                    cents_rows = None  # no centroids saved: flat store
            if cents_rows is not None:
                # restore the IVF layout: the saved doc_index IS the
                # partitioned parquet, so keep it as an UNCACHED scan —
                # caching would trade the file-level partition pruning
                # for an in-memory full-corpus copy
                from langchain_memvid_spark.core.ivf import IVFIndex

                cents = sorted(
                    (int(r["cluster_id"]), [float(x) for x in r["centroid"]])
                    for r in cents_rows
                )
                store._ivf = IVFIndex(
                    cents, path=idx_path, metric=store.config.index.metric
                )
                keep = [f.name for f in INDEX_SCHEMA.fields] + ["cluster_id"]
                store._doc_index = idx.select(keep)
                # reads serve straight off the snapshot (zero copy);
                # the first APPEND copies the layout into the store's
                # versioned root so the save stays immutable
                store._layout_foreign = True
                # appends re-read the directory with the explicit layout
                # schema; columns backfilled in-plan above must be
                # re-derived there (files read as NULL)
                store._layout_derived = bool(set(cls._DERIVABLE_COLS) - physical)
            else:
                store._doc_index = idx.select(
                    [f.name for f in INDEX_SCHEMA.fields]
                ).cache()
            store._payload = spark.read.parquet(os.path.join(path, "payload")).cache()
        except Exception as e:
            raise StorageError(f"load from {path} failed: {e}") from e
        store._count = store._doc_index.count()
        return store

    @classmethod
    def attach(
        cls,
        table_path: str,
        spark: SparkSession,
        embeddings: Any | None = None,
        config: EngineConfig | None = None,
        centroids: list[tuple[int, list[float]]] | None = None,
    ) -> "SparkVectorStore":
        """Open a SEARCHABLE store over an externally written
        doc_index-shaped parquet table WITHOUT copying it — the
        composition closer for streaming ingest: the exactly-once sink
        (streaming/documents.py stream_ingest_store / stream_ingest_ivf)
        writes doc_id/text/metadata/embedding/qscale/qvec rows, and
        attach() puts the full search surface (similarity / MMR /
        relevance / batch / hybrid) on top of them in place.

        Missing engine columns are derived in-plan (category from the
        metadata JSON, int8/int4 codes from the floats). When the table
        carries a ``cluster_id`` partition column AND ``centroids`` are
        supplied (the same list the streaming assignment used), the
        partition-pruned IVF search path is live immediately — streamed
        rows are probed, not full-scanned, and the table stays an
        UNCACHED scan so the cluster_id filter remains a file-level
        PartitionFilter. Payload rows (full-metadata tier) are not part
        of the streamed table; include_full_metadata returns the
        essential tier only."""
        store = cls(spark, embeddings=embeddings, config=config)
        try:
            idx = spark.read.parquet(table_path)
        except Exception as e:
            raise StorageError(f"attach of {table_path} failed: {e}") from e
        physical = set(idx.columns)
        if "category" not in idx.columns:
            idx = idx.withColumn(
                "category",
                F.from_json(F.col("metadata_json"), "category STRING")["category"],
            )
        if "qvec" not in idx.columns:
            qscale, qvec = quantize_cols(F.col("embedding"))
            idx = idx.withColumn("qscale", qscale).withColumn("qvec", qvec)
        if "pvec" not in idx.columns:
            pscale, pvec = quantize4_cols(F.col("embedding"))
            idx = idx.withColumn("pscale", pscale).withColumn("pvec", pvec)
        if "mh0" not in idx.columns:
            # attached tables carry no signatures: sign once (see load)
            from langchain_memvid_spark.operators.dedup import minhash_signatures

            idx = idx.join(
                minhash_signatures(idx.select("doc_id", "text")), "doc_id", "left"
            )
        keep = [f.name for f in INDEX_SCHEMA.fields]
        if "cluster_id" in idx.columns and centroids is not None:
            from langchain_memvid_spark.core.ivf import IVFIndex

            store._ivf = IVFIndex(
                sorted((int(c), [float(x) for x in v]) for c, v in centroids),
                path=table_path,
                metric=store.config.index.metric,
            )
            store._doc_index = idx.select(keep + ["cluster_id"])
            # remember which engine columns exist only as the in-plan
            # derivations above: appends re-read the directory with the
            # explicit layout schema and must re-derive them there
            store._layout_derived = bool(set(cls._DERIVABLE_COLS) - physical)
        else:
            store._doc_index = idx.select(keep).cache()
        store._count = store._doc_index.count()
        return store

    # ------------------------------------------------------------- dataframes

    @property
    def doc_index(self) -> DataFrame:
        return self._doc_index

    @property
    def payload(self) -> DataFrame:
        return self._payload
