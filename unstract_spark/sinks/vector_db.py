"""External vector-DB adapters (T5/T6) — pgvector-shaped storage behind
the engine's vector-store interface.

Reference: unstract/sdk1/src/unstract/sdk1/adapters/vectordb/ registers
six backends (postgres/pgvector, milvus, pinecone, qdrant, weaviate,
supabase) behind llama-index VectorStore objects; every one is used the
same way — upsert chunk nodes under a deterministic doc_id, then
doc_id-filtered top-k cosine queries (query semantics
sdk1/index.py:65-131, Constants.TOP_K; delete-then-add reindex
index.py:223-375).

Spark-first: `VectorStoreBackend` is that contract as an interface over
DataFrames. Two engine backends implement it:

- `operators.index_store.VectorIndexStore` — the in-engine parquet/
  Delta-shaped index (partition-pruned, the 100 TB path);
- `JdbcVectorStore` (here) — an external relational vector store in the
  pgvector shape: one row per chunk, embedding stored as a
  `vector(dim)` column on PostgreSQL+pgvector, or as a JSON-array text
  column on any other JDBC dialect (the same '[x,y,z]' literal text
  works for both, because pgvector's input format IS a JSON-style
  array). DDL reuses the dialect machinery in sinks/jdbc.py; reads come
  back through Spark's JDBC source with the doc_id filter pushed into
  the remote query, so only one document's chunks ever cross the wire.

Scoring parity: both backends rank with the same rounded-cosine +
chunk_no tie-break, so swapping backends cannot reorder results. On a
real pgvector deployment the top-k itself can be pushed down —
`pgvector_topk_sql` emits that `ORDER BY embedding <=> q LIMIT k`
query; it is generated (and unit-tested) here, executed only where a
pgvector server exists.
"""

from __future__ import annotations

import abc
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from unstract_spark.operators.retrieval import cosine
from unstract_spark.sinks.jdbc import _DIALECT_TYPES, _quote_ident, execute_ddl

CHUNK_COLS = ("doc_id", "file_hash", "chunk_no", "chunk_text", "embedding")

_DOC_ID_RE = re.compile(r"^[A-Za-z0-9_\-:.]+$")


def _safe_doc_id(doc_id: str) -> str:
    """doc_ids are deterministic sha256 hexes (sdk1/index.py:460-516);
    reject anything that couldn't be one before it reaches SQL text."""
    if not doc_id or not _DOC_ID_RE.match(doc_id):
        raise ValueError(f"unsafe doc_id literal: {doc_id!r}")
    return doc_id


class VectorStoreBackend(abc.ABC):
    """Storage contract for the chunk/vector index.

    Chunks carry (doc_id, file_hash, chunk_no, chunk_text, embedding)
    — schemas.CHUNKS. Upserts are idempotent on doc_id (probe before
    write; reindex = delete-then-add), queries are doc-scoped top-k
    cosine. Backends only supply storage; ranking semantics live here
    so every backend returns identical rows.
    """

    @abc.abstractmethod
    def read_chunks(self) -> DataFrame:
        """Every stored chunk, in the CHUNKS column shape."""

    @abc.abstractmethod
    def existing_doc_ids(self) -> DataFrame:
        """Distinct doc_id single-column DataFrame (the upsert probe)."""

    @abc.abstractmethod
    def upsert(self, chunks: DataFrame, reindex: bool = False) -> int:
        """Idempotent write; returns rows written (0 when all probed)."""

    @abc.abstractmethod
    def _chunks_for_doc(self, doc_id: str) -> DataFrame:
        """One document's chunks, with the doc_id filter pushed into
        storage (partition pruning / remote WHERE)."""

    def query_topk(
        self,
        doc_id: str,
        query_vec: list[float],
        k: int = 5,
        min_score: float | None = 0.0,
    ) -> DataFrame:
        """T6: top-k chunks of ONE document by cosine to the query.

        score>0 cutoff mirrors sdk1/index.py:118-124; ranking is over
        the rounded score with a chunk_no tie-break so every backend
        (and the SQL oracle) agrees on boundary rows.
        """
        qv = F.array(*[F.lit(float(x)) for x in query_vec])
        scored = self._chunks_for_doc(_safe_doc_id(doc_id)).select(
            "doc_id",
            "chunk_no",
            "chunk_text",
            F.round(cosine(F.col("embedding"), qv), 6).alias("score"),
        )
        if min_score is not None:
            scored = scored.filter(F.col("score") > min_score)
        w = Window.partitionBy("doc_id").orderBy(
            F.col("score").desc(), F.col("chunk_no").asc()
        )
        return scored.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )


def vector_table_ddl(
    table: str, dialect: str, dim: int, pgvector: bool | None = None
) -> str:
    """CREATE TABLE for the chunk/vector table.

    PostgreSQL defaults to a pgvector `vector(dim)` embedding column
    (the reference's Postgres adapter is pgvector-backed); every other
    dialect stores the embedding as its JSON/document type. Key columns
    are VARCHAR (not the dialect's large-text type) so DISTINCT /
    equality pushdown work everywhere (Derby forbids CLOB comparisons).
    """
    if pgvector is None:
        pgvector = dialect == "postgresql"
    types = _DIALECT_TYPES[dialect]
    emb_type = f"vector({dim})" if pgvector else types["json"]
    q = lambda n: _quote_ident(n, dialect)  # noqa: E731
    cols = ", ".join(
        [
            f"{q('doc_id')} VARCHAR(256) NOT NULL",
            f"{q('file_hash')} VARCHAR(256) NOT NULL",
            f"{q('chunk_no')} {types['int']} NOT NULL",
            f"{q('chunk_text')} {types['string']}",
            f"{q('embedding')} {emb_type}",
        ]
    )
    return f"CREATE TABLE {q(table)} ({cols})"


def pgvector_topk_sql(
    table: str,
    doc_id: str,
    query_vec: list[float],
    k: int = 5,
    min_score: float | None = 0.0,
) -> str:
    """The fully-pushed-down pgvector top-k (runs ON the server).

    `<=>` is pgvector cosine *distance*; score = 1 - distance. Emitted
    for deployments with a live pgvector — the engine-side fallback in
    `JdbcVectorStore.query_topk` computes the identical ranking from
    the fetched chunks.
    """
    vec = "[" + ",".join(repr(float(x)) for x in query_vec) + "]"
    did = _safe_doc_id(doc_id)
    q = lambda n: _quote_ident(n, "postgresql")  # noqa: E731
    where = f"{q('doc_id')} = '{did}'"
    if min_score is not None:
        where += f" AND 1 - ({q('embedding')} <=> '{vec}') > {float(min_score)!r}"
    return (
        f"SELECT {q('doc_id')}, {q('chunk_no')}, {q('chunk_text')}, "
        f"1 - ({q('embedding')} <=> '{vec}') AS score "
        f"FROM {q(table)} WHERE {where} "
        f"ORDER BY {q('embedding')} <=> '{vec}' ASC, {q('chunk_no')} ASC LIMIT {int(k)}"
    )


class JdbcVectorStore(VectorStoreBackend):
    """pgvector-shaped external vector store over any JDBC dialect.

    Embeddings travel as '[x,y,z]' text — pgvector ingests that
    directly into `vector(dim)` (assignment cast), JSON dialects store
    it verbatim, and reads parse it back with from_json. Writes go
    through df.write.jdbc (one connection per partition, `batchsize`
    bounded); the upsert probe and per-doc reads push their predicates
    into the remote query so the driver never scans the index.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str = "vector_index",
        dialect: str = "postgresql",
        dim: int = 64,
        properties: dict[str, str] | None = None,
        pgvector: bool | None = None,
        ensure_table: bool = True,
        num_partitions: int = 8,
    ):
        self.spark = spark
        self.url = url
        self.table = table
        self.dialect = dialect
        self.dim = dim
        self.properties = properties or {}
        self.pgvector = pgvector if pgvector is not None else dialect == "postgresql"
        self.num_partitions = num_partitions
        if ensure_table:
            execute_ddl(
                spark,
                url,
                [vector_table_ddl(table, dialect, dim, self.pgvector)],
                self.properties,
            )

    # -- storage plumbing ------------------------------------------------

    def _q(self, name: str) -> str:
        return _quote_ident(name, self.dialect)

    def _read_sql(self, sql: str) -> DataFrame:
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("query", sql)
        )
        for key, val in self.properties.items():
            reader = reader.option(key, val)
        return reader.load()

    def _parse(self, raw: DataFrame) -> DataFrame:
        # positional rename: dialects case-fold / auto-name expression
        # columns, so the remote names are not trustworthy
        df = raw.toDF(*CHUNK_COLS)
        return df.select(
            "doc_id",
            "file_hash",
            F.col("chunk_no").cast("int").alias("chunk_no"),
            "chunk_text",
            F.from_json(F.col("embedding"), "array<float>").alias("embedding"),
        )

    def _select_cols(self) -> str:
        # pgvector's vector type reads back as its '[x,y,z]' literal via
        # a text cast; JSON dialects already store text
        emb = self._q("embedding")
        if self.pgvector:
            emb = f"CAST({emb} AS TEXT)"
        cols = [self._q(c) for c in ("doc_id", "file_hash", "chunk_no", "chunk_text")]
        return ", ".join(cols + [emb])

    # -- VectorStoreBackend ----------------------------------------------

    def read_chunks(self) -> DataFrame:
        return self._parse(
            self._read_sql(f"SELECT {self._select_cols()} FROM {self._q(self.table)}")
        )

    def existing_doc_ids(self) -> DataFrame:
        sql = f"SELECT DISTINCT {self._q('doc_id')} FROM {self._q(self.table)}"
        return self._read_sql(sql).toDF("doc_id")

    def delete_docs(self, doc_ids: list[str]) -> None:
        """Driver-side delete (reindex path, index.py:408-418). Bounded:
        one pipeline run touches at most its own batch of documents."""
        if not doc_ids:
            return
        safe = [_safe_doc_id(d) for d in doc_ids]
        stmts = []
        for i in range(0, len(safe), 256):
            in_list = ", ".join(f"'{d}'" for d in safe[i : i + 256])
            stmts.append(
                f"DELETE FROM {self._q(self.table)} WHERE {self._q('doc_id')} IN ({in_list})"
            )
        execute_ddl(self.spark, self.url, stmts, self.properties, ignore_existing=False)

    def _docs_present(self, doc_ids: list[str]) -> set[str]:
        """Pushed-down per-batch probe: ONE remote query over the
        incoming id set (O(batch) with a doc_id index), never a
        DISTINCT scan of the whole remote table."""
        if not doc_ids:
            return set()
        safe = [_safe_doc_id(d) for d in doc_ids]
        present: set[str] = set()
        for i in range(0, len(safe), 256):
            in_list = ", ".join(f"'{d}'" for d in safe[i : i + 256])
            sql = (
                f"SELECT DISTINCT {self._q('doc_id')} FROM {self._q(self.table)} "
                f"WHERE {self._q('doc_id')} IN ({in_list})"
            )
            present.update(r.doc_id for r in self._read_sql(sql).toDF("doc_id").collect())
        return present

    def upsert(self, chunks: DataFrame, reindex: bool = False) -> int:
        incoming = chunks.select(*CHUNK_COLS)
        ids = [r.doc_id for r in incoming.select("doc_id").distinct().collect()]
        if reindex:
            self.delete_docs(ids)
        else:
            present = self._docs_present(ids)
            if present:
                incoming = incoming.filter(~F.col("doc_id").isin(list(present)))
        incoming = incoming.localCheckpoint(eager=True)  # pin before the write mutates the probe
        n = incoming.count()
        if n == 0:
            return 0
        serialized = incoming.withColumn(
            "embedding", F.to_json(F.col("embedding").cast("array<float>"))
        )
        (
            serialized.repartition(min(self.num_partitions, max(n // 100, 1)))
            .write.jdbc(
                self.url,
                self._q(self.table),
                mode="append",
                properties=self.properties,
            )
        )
        return n

    def _chunks_for_doc(self, doc_id: str) -> DataFrame:
        sql = (
            f"SELECT {self._select_cols()} FROM {self._q(self.table)} "
            f"WHERE {self._q('doc_id')} = '{_safe_doc_id(doc_id)}'"
        )
        return self._parse(self._read_sql(sql))


def collection_name(prefix: str | None, dim: int) -> str:
    """Collection/table naming parity: `<prefix>_<embedding_dim>`,
    defaulting the prefix to `unstract_vector_db`
    (reference adapters/vectordb/helper.py:61-101 get_collection_name —
    one collection per (user prefix, embedding dimension) so indexes
    built with different embedding models never mix)."""
    return f"{prefix or 'unstract_vector_db'}_{int(dim)}"


def _distributed_point_upsert(
    incoming: DataFrame,
    batch_size: int,
    transport,
    headers: dict,
    build_request,
) -> int:
    """Shared distributed write path for point-store backends: one HTTP
    batch per `batch_size` rows per Arrow batch per partition — N
    executors post concurrently, nothing funnels through the driver.
    `build_request(points) -> (url, payload)` supplies the service's
    request spelling; points are the generic {id, vector, payload}
    triple every point store stores."""
    import pandas as pd

    def post_batches(batches):
        for pdf in batches:
            for i in range(0, len(pdf), batch_size):
                part = pdf.iloc[i : i + batch_size]
                points = [
                    {
                        "id": f"{r.doc_id}:{int(r.chunk_no)}",
                        "vector": [float(x) for x in r.embedding],
                        "payload": {
                            "doc_id": r.doc_id,
                            "file_hash": r.file_hash,
                            "chunk_no": int(r.chunk_no),
                            "chunk_text": r.chunk_text,
                        },
                    }
                    for r in part.itertuples()
                ]
                req_url, payload = build_request(points)
                transport(req_url, payload, headers)
                yield pd.DataFrame({"n": [len(points)]})

    written = incoming.mapInPandas(post_batches, schema="n long")
    total = written.agg(F.sum("n").alias("n")).collect()[0]["n"]
    return int(total or 0)


class RestVectorStore(VectorStoreBackend):
    """Qdrant-shaped external vector store over a JSON/REST transport.

    Reference adapters/vectordb/{qdrant,pinecone,weaviate,milvus}/ all
    wrap point-store services with the same access pattern: ensure a
    collection sized to the embedding dimension, upsert points
    `{id, vector, payload}` in batches, and run doc_id-filtered top-k
    similarity queries (query semantics sdk1/index.py:65-131). This
    backend speaks that protocol in the Qdrant REST shape:

    - `PUT  collections/<name>`                    — ensure collection
    - `PUT  collections/<name>/points`             — batched upsert
    - `POST collections/<name>/points/scroll`      — filtered read-back
    - `POST collections/<name>/points/delete`      — reindex delete
    - `POST collections/<name>/points/search`      — server-side top-k

    Scale shape: upserts run inside `mapInPandas`, one HTTP batch per
    Arrow batch per partition — N executors post concurrently and
    nothing funnels through the driver. Reads are doc-scoped by
    contract (one document's chunks, the reference's only query shape),
    so the scroll result is bounded by a single document regardless of
    index size; the unbounded-scan paths (`read_chunks`,
    `existing_doc_ids`) page through scroll and exist for tests and
    small indexes — the 100 TB index lives in the in-engine store, with
    external stores fed doc-by-doc exactly like the reference feeds
    pgvector/Qdrant.

    Ranking runs engine-side through the shared `query_topk` so results
    are bit-identical across backends; `search_topk_request` emits the
    pushed-down server-side query for live deployments.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_url: str,
        transport=None,
        collection: str | None = None,
        prefix: str | None = None,
        dim: int = 64,
        api_key: str | None = None,
        batch_size: int = 256,
        ensure: bool = True,
    ):
        from unstract_spark.providers import http_json_transport

        self.spark = spark
        self.base_url = base_url.rstrip("/")
        self.transport = transport or http_json_transport
        self.dim = dim
        self.collection = collection or collection_name(prefix, dim)
        self.headers = {"api-key": api_key} if api_key else {}
        self.batch_size = batch_size
        if ensure:
            self._call(
                f"collections/{self.collection}",
                {"vectors": {"size": dim, "distance": "Cosine"}},
            )

    def _call(self, path: str, payload: dict) -> dict:
        return self.transport(f"{self.base_url}/{path}", payload, self.headers)

    def _scroll(self, flt: dict | None) -> list[dict]:
        points, offset = [], None
        while True:
            body = self._call(
                f"collections/{self.collection}/points/scroll",
                {
                    "filter": flt,
                    "with_payload": True,
                    "with_vector": True,
                    "limit": 1024,
                    "offset": offset,
                },
            )
            result = body.get("result") or {}
            points.extend(result.get("points") or [])
            offset = result.get("next_page_offset")
            if offset is None:
                return points

    @staticmethod
    def _doc_filter(doc_id: str) -> dict:
        return {
            "must": [{"key": "doc_id", "match": {"value": _safe_doc_id(doc_id)}}]
        }

    def _to_df(self, points: list[dict]) -> DataFrame:
        from unstract_spark.schemas import CHUNKS

        rows = [
            (
                p["payload"]["doc_id"],
                p["payload"]["file_hash"],
                int(p["payload"]["chunk_no"]),
                p["payload"]["chunk_text"],
                [float(x) for x in p["vector"]],
            )
            for p in points
        ]
        return self.spark.createDataFrame(rows, schema=CHUNKS)

    # -- VectorStoreBackend ----------------------------------------------

    def read_chunks(self) -> DataFrame:
        return self._to_df(self._scroll(None))

    def existing_doc_ids(self) -> DataFrame:
        seen = sorted(
            {p["payload"]["doc_id"] for p in self._scroll(None)}
        )
        return self.spark.createDataFrame(
            [(d,) for d in seen], schema="doc_id string"
        )

    def delete_docs(self, doc_ids: list[str]) -> None:
        for doc_id in doc_ids:
            self._call(
                f"collections/{self.collection}/points/delete",
                {"filter": self._doc_filter(doc_id)},
            )

    def _docs_present(self, doc_ids: list[str]) -> set[str]:
        """Per-doc existence probe: one limit-1 filtered scroll per
        incoming doc_id — O(batch docs), never a scan of the remote
        index (the reference probes per doc_id the same way,
        index.py:293-335)."""
        present = set()
        for d in doc_ids:
            body = self._call(
                f"collections/{self.collection}/points/scroll",
                {"filter": self._doc_filter(d), "limit": 1, "with_payload": False},
            )
            if (body.get("result") or {}).get("points"):
                present.add(d)
        return present

    def upsert(self, chunks: DataFrame, reindex: bool = False) -> int:
        incoming = chunks.select(*CHUNK_COLS)
        ids = [r.doc_id for r in incoming.select("doc_id").distinct().collect()]
        if reindex:
            self.delete_docs(ids)
        else:
            present = self._docs_present(ids)
            if present:
                incoming = incoming.filter(~F.col("doc_id").isin(list(present)))
        url, coll = self.base_url, self.collection

        def build_request(points: list[dict]) -> tuple[str, dict]:
            # Live Qdrant accepts only unsigned-int or UUID point ids —
            # the generic `<doc_id>:<chunk_no>` string would 400. A
            # deterministic uuid5 of that string keeps upserts
            # idempotent (same chunk → same id → last-write-wins) while
            # doc_id/chunk_no stay authoritative in the payload, which
            # is what every filter and read-back path already uses.
            import uuid

            pts = [
                {**p, "id": str(uuid.uuid5(uuid.NAMESPACE_URL, p["id"]))}
                for p in points
            ]
            return f"{url}/collections/{coll}/points", {"points": pts}

        return _distributed_point_upsert(
            incoming, self.batch_size, self.transport, self.headers, build_request
        )

    def _chunks_for_doc(self, doc_id: str) -> DataFrame:
        return self._to_df(self._scroll(self._doc_filter(doc_id)))

    def search_topk_request(
        self, doc_id: str, query_vec: list[float], k: int = 5
    ) -> tuple[str, dict]:
        """The fully-pushed-down server-side top-k (runs ON the vector
        service — Qdrant ranks by cosine and applies the payload filter
        remotely). Emitted for live deployments; the engine-side
        `query_topk` computes the identical ranking from scrolled
        chunks."""
        return (
            f"collections/{self.collection}/points/search",
            {
                "vector": [float(x) for x in query_vec],
                "filter": self._doc_filter(doc_id),
                "limit": int(k),
                "with_payload": True,
            },
        )


class PineconeVectorStore(VectorStoreBackend):
    """Pinecone-shaped external vector store (third external protocol).

    Reference adapters/vectordb/pinecone wraps the same contract; the
    public data-plane API differs from Qdrant in spelling, not shape:

    - `POST {host}/vectors/upsert`  {"vectors": [{id, values,
      metadata}], "namespace"} — batched upsert ({"upsertedCount"}).
    - `POST {host}/vectors/list`   {"prefix", "paginationToken"} —
      id listing; our point ids are `<doc_id>:<chunk_no>`, so a
      `<doc_id>:` prefix IS the doc filter (Pinecone's documented
      pattern for grouped vectors).
    - `POST {host}/vectors/fetch`  {"ids": [...]} — bodies for listed
      ids.
    - `POST {host}/vectors/delete` {"filter": {"doc_id": {"$eq": ...}}}.
    - `POST {host}/query` {"vector", "topK", "filter", ...} — the
      server-side top-k, emitted by `search_topk_request`.

    Index creation is control-plane (api.pinecone.io), out of band —
    like the reference, which assumes the index exists. The transport
    seam treats every endpoint as a JSON call; GET-styled endpoints are
    modeled as POST bodies (the fake and a real adapter shim both
    accept that). Same distributed upsert and engine-side ranking as
    every other backend.
    """

    def __init__(
        self,
        spark: SparkSession,
        host: str,
        transport=None,
        namespace: str = "",
        api_key: str | None = None,
        batch_size: int = 256,
    ):
        from unstract_spark.providers import http_json_transport

        self.spark = spark
        self.host = host.rstrip("/")
        self.transport = transport or http_json_transport
        self.namespace = namespace
        self.headers = {"Api-Key": api_key} if api_key else {}
        self.batch_size = batch_size

    def _call(self, path: str, payload: dict) -> dict:
        payload = {**payload, "namespace": self.namespace}
        return self.transport(f"{self.host}/{path}", payload, self.headers)

    def _list_ids(self, prefix: str | None) -> list[str]:
        ids, token = [], None
        while True:
            body = self._call(
                "vectors/list",
                {"prefix": prefix, "limit": 100, "paginationToken": token},
            )
            ids.extend(v["id"] for v in body.get("vectors") or [])
            token = (body.get("pagination") or {}).get("next")
            if not token:
                return ids

    def _fetch(self, ids: list[str]) -> list[dict]:
        out: list[dict] = []
        for i in range(0, len(ids), 100):
            body = self._call("vectors/fetch", {"ids": ids[i : i + 100]})
            out.extend((body.get("vectors") or {}).values())
        return out

    def _to_df(self, vectors: list[dict]) -> DataFrame:
        from unstract_spark.schemas import CHUNKS

        rows = [
            (
                v["metadata"]["doc_id"],
                v["metadata"]["file_hash"],
                int(v["metadata"]["chunk_no"]),
                v["metadata"]["chunk_text"],
                [float(x) for x in v["values"]],
            )
            for v in vectors
        ]
        return self.spark.createDataFrame(rows, schema=CHUNKS)

    # -- VectorStoreBackend ----------------------------------------------

    def read_chunks(self) -> DataFrame:
        return self._to_df(self._fetch(self._list_ids(None)))

    def existing_doc_ids(self) -> DataFrame:
        seen = sorted({pid.rsplit(":", 1)[0] for pid in self._list_ids(None)})
        return self.spark.createDataFrame(
            [(d,) for d in seen], schema="doc_id string"
        )

    def delete_docs(self, doc_ids: list[str]) -> None:
        for doc_id in doc_ids:
            self._call(
                "vectors/delete",
                {"filter": {"doc_id": {"$eq": _safe_doc_id(doc_id)}}},
            )

    def _docs_present(self, doc_ids: list[str]) -> set[str]:
        """Per-doc existence probe via small prefix listings —
        O(batch docs), never a scan of the remote index. The rsplit
        check guards against a colon-bearing doc_id ("a") matching a
        sibling's points ("a:1:0" also starts with "a:")."""
        present = set()
        for d in doc_ids:
            body = self._call("vectors/list", {"prefix": f"{d}:", "limit": 5})
            ids = [v["id"] for v in body.get("vectors") or []]
            if any(i.rsplit(":", 1)[0] == d for i in ids):
                present.add(d)
        return present

    def upsert(self, chunks: DataFrame, reindex: bool = False) -> int:
        incoming = chunks.select(*CHUNK_COLS)
        ids = [r.doc_id for r in incoming.select("doc_id").distinct().collect()]
        if reindex:
            self.delete_docs(ids)
        else:
            present = self._docs_present(ids)
            if present:
                incoming = incoming.filter(~F.col("doc_id").isin(list(present)))
        host, ns = self.host, self.namespace

        def build_request(points: list[dict]) -> tuple[str, dict]:
            return (
                f"{host}/vectors/upsert",
                {
                    "vectors": [
                        {
                            "id": p["id"],
                            "values": p["vector"],
                            "metadata": p["payload"],
                        }
                        for p in points
                    ],
                    "namespace": ns,
                },
            )

        return _distributed_point_upsert(
            incoming, self.batch_size, self.transport, self.headers, build_request
        )

    def _chunks_for_doc(self, doc_id: str) -> DataFrame:
        did = _safe_doc_id(doc_id)
        ids = self._list_ids(f"{did}:")
        # exact-match guard: doc ids may legally contain ':', so the
        # prefix "a:" would also match doc "a:1"'s points — filter on
        # the metadata doc_id, which is authoritative
        vecs = [v for v in self._fetch(ids) if v["metadata"]["doc_id"] == did]
        return self._to_df(vecs)

    def search_topk_request(
        self, doc_id: str, query_vec: list[float], k: int = 5
    ) -> tuple[str, dict]:
        """Server-side top-k (Pinecone ranks by the index metric and
        applies the metadata filter remotely)."""
        return (
            "query",
            {
                "vector": [float(x) for x in query_vec],
                "topK": int(k),
                "filter": {"doc_id": {"$eq": _safe_doc_id(doc_id)}},
                "includeMetadata": True,
                "namespace": self.namespace,
            },
        )


class MilvusVectorStore(VectorStoreBackend):
    """Milvus-shaped external vector store (RESTful v2 data plane).

    Reference adapters/vectordb/milvus wraps MilvusClient/llama-index
    (milvus.py:24-60) behind the same upsert/query contract; this
    backend speaks the public Milvus v2 REST spelling over the
    injected-transport seam:

    - `POST /v2/vectordb/collections/create` — ensure collection
      (dimension + COSINE metric; string primary key, dynamic fields).
    - `POST /v2/vectordb/entities/upsert`    — batched {id, vector,
      payload-fields} rows under "data".
    - `POST /v2/vectordb/entities/query`     — filter-expression reads
      (`doc_id == "..."`), offset/limit paging.
    - `POST /v2/vectordb/entities/delete`    — filter-expression delete.
    - `POST /v2/vectordb/entities/search`    — server-side top-k
      (emitted by `search_topk_request` for live deployments).

    Milvus filters are expression STRINGS, so doc ids pass through
    `_safe_doc_id` before entering one (the same SQL-ish injection
    guard as the JDBC store). Same distributed mapInPandas upsert and
    engine-side ranking as every other backend.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_url: str,
        transport=None,
        collection: str | None = None,
        prefix: str | None = None,
        dim: int = 64,
        token: str | None = None,
        batch_size: int = 256,
        ensure: bool = True,
    ):
        from unstract_spark.providers import http_json_transport

        self.spark = spark
        self.base_url = base_url.rstrip("/")
        self.transport = transport or http_json_transport
        self.dim = dim
        self.collection = collection or collection_name(prefix, dim)
        self.headers = {"Authorization": f"Bearer {token}"} if token else {}
        self.batch_size = batch_size
        if ensure:
            self._call(
                "v2/vectordb/collections/create",
                {
                    "collectionName": self.collection,
                    "dimension": dim,
                    "metricType": "COSINE",
                    "idType": "VarChar",
                    "enableDynamicField": True,
                },
            )

    def _call(self, path: str, payload: dict) -> dict:
        return self.transport(f"{self.base_url}/{path}", payload, self.headers)

    @staticmethod
    def _doc_filter(doc_id: str) -> str:
        return f'doc_id == "{_safe_doc_id(doc_id)}"'

    def _query(self, flt: str | None) -> list[dict]:
        rows, offset = [], 0
        while True:
            body = self._call(
                "v2/vectordb/entities/query",
                {
                    "collectionName": self.collection,
                    "filter": flt or "",
                    "outputFields": list(CHUNK_COLS),
                    "limit": 1024,
                    "offset": offset,
                },
            )
            page = body.get("data") or []
            rows.extend(page)
            if len(page) < 1024:
                return rows
            offset += 1024

    def _to_df(self, rows: list[dict]) -> DataFrame:
        from unstract_spark.schemas import CHUNKS

        data = [
            (
                r["doc_id"],
                r["file_hash"],
                int(r["chunk_no"]),
                r["chunk_text"],
                [float(x) for x in r["embedding"]],
            )
            for r in rows
        ]
        return self.spark.createDataFrame(data, schema=CHUNKS)

    # -- VectorStoreBackend ----------------------------------------------

    def read_chunks(self) -> DataFrame:
        return self._to_df(self._query(None))

    def existing_doc_ids(self) -> DataFrame:
        seen = sorted({r["doc_id"] for r in self._query(None)})
        return self.spark.createDataFrame(
            [(d,) for d in seen], schema="doc_id string"
        )

    def delete_docs(self, doc_ids: list[str]) -> None:
        for doc_id in doc_ids:
            self._call(
                "v2/vectordb/entities/delete",
                {"collectionName": self.collection, "filter": self._doc_filter(doc_id)},
            )

    def _docs_present(self, doc_ids: list[str]) -> set[str]:
        """One limit-1 filtered query per incoming doc — O(batch docs),
        never an index scan."""
        present = set()
        for d in doc_ids:
            body = self._call(
                "v2/vectordb/entities/query",
                {
                    "collectionName": self.collection,
                    "filter": self._doc_filter(d),
                    "outputFields": ["doc_id"],
                    "limit": 1,
                    "offset": 0,
                },
            )
            if body.get("data"):
                present.add(d)
        return present

    def upsert(self, chunks: DataFrame, reindex: bool = False) -> int:
        incoming = chunks.select(*CHUNK_COLS)
        ids = [r.doc_id for r in incoming.select("doc_id").distinct().collect()]
        if reindex:
            self.delete_docs(ids)
        else:
            present = self._docs_present(ids)
            if present:
                incoming = incoming.filter(~F.col("doc_id").isin(list(present)))
        url, coll = self.base_url, self.collection

        def build_request(points: list[dict]) -> tuple[str, dict]:
            return (
                f"{url}/v2/vectordb/entities/upsert",
                {
                    "collectionName": coll,
                    "data": [
                        {"id": p["id"], "embedding": p["vector"], **p["payload"]}
                        for p in points
                    ],
                },
            )

        return _distributed_point_upsert(
            incoming, self.batch_size, self.transport, self.headers, build_request
        )

    def _chunks_for_doc(self, doc_id: str) -> DataFrame:
        return self._to_df(self._query(self._doc_filter(doc_id)))

    def search_topk_request(
        self, doc_id: str, query_vec: list[float], k: int = 5
    ) -> tuple[str, dict]:
        """Server-side top-k (Milvus ranks by the collection metric and
        applies the filter expression remotely)."""
        return (
            "v2/vectordb/entities/search",
            {
                "collectionName": self.collection,
                "data": [[float(x) for x in query_vec]],
                "filter": self._doc_filter(doc_id),
                "limit": int(k),
                "outputFields": ["doc_id", "chunk_no", "chunk_text"],
            },
        )


class WeaviateVectorStore(VectorStoreBackend):
    """Weaviate-shaped external vector store (REST objects + GraphQL).

    Reference adapters/vectordb/weaviate wraps weaviate-client behind
    the shared contract; this backend speaks the public wire spelling:

    - `POST /v1/schema`        — ensure class (vectorizer "none": the
      engine supplies vectors, matching the reference's use).
    - `POST /v1/batch/objects` — batched {class, id, properties,
      vector} objects. Weaviate REQUIRES UUID object ids, so ids are
      the same deterministic uuid5('<doc_id>:<chunk_no>') the Qdrant
      backend uses (idempotent re-upserts).
    - `POST /v1/graphql`       — reads: a Get query with a doc_id
      where-filter, paging via offset/limit, vectors via _additional.
    - `POST /v1/batch/delete`  — delete-by-where (match.class + where).

    Weaviate class names must start uppercase ([A-Z][A-Za-z0-9_]*);
    `_class_name` normalizes the shared collection naming. GraphQL
    strings embed only _safe_doc_id-validated literals. Same
    distributed upsert/ranking as the other point stores.
    """

    def __init__(
        self,
        spark: SparkSession,
        base_url: str,
        transport=None,
        collection: str | None = None,
        prefix: str | None = None,
        dim: int = 64,
        api_key: str | None = None,
        batch_size: int = 256,
        ensure: bool = True,
    ):
        from unstract_spark.providers import http_json_transport

        self.spark = spark
        self.base_url = base_url.rstrip("/")
        self.transport = transport or http_json_transport
        self.dim = dim
        self.cls = self._class_name(collection or collection_name(prefix, dim))
        self.headers = {"Authorization": f"Bearer {api_key}"} if api_key else {}
        self.batch_size = batch_size
        if ensure:
            self._call(
                "v1/schema",
                {
                    "class": self.cls,
                    "vectorizer": "none",
                    "properties": [
                        {"name": "doc_id", "dataType": ["text"]},
                        {"name": "file_hash", "dataType": ["text"]},
                        {"name": "chunk_no", "dataType": ["int"]},
                        {"name": "chunk_text", "dataType": ["text"]},
                    ],
                },
            )

    @staticmethod
    def _class_name(name: str) -> str:
        cleaned = re.sub(r"[^A-Za-z0-9_]", "_", name)
        return cleaned[:1].upper() + cleaned[1:]

    def _call(self, path: str, payload: dict) -> dict:
        return self.transport(f"{self.base_url}/{path}", payload, self.headers)

    def _where(self, doc_id: str) -> str:
        return (
            '{path: ["doc_id"], operator: Equal, '
            f'valueText: "{_safe_doc_id(doc_id)}"}}'
        )

    def _graphql_get(self, where: str | None) -> list[dict]:
        objs, offset = [], 0
        while True:
            args = [f"limit: 1024, offset: {offset}"]
            if where:
                args.append(f"where: {where}")
            q = (
                f"{{ Get {{ {self.cls}({', '.join(args)}) "
                "{ doc_id file_hash chunk_no chunk_text "
                "_additional { vector } } } }"
            )
            body = self._call("v1/graphql", {"query": q})
            page = ((body.get("data") or {}).get("Get") or {}).get(self.cls) or []
            objs.extend(page)
            if len(page) < 1024:
                return objs
            offset += 1024

    def _to_df(self, objs: list[dict]) -> DataFrame:
        from unstract_spark.schemas import CHUNKS

        rows = [
            (
                o["doc_id"],
                o["file_hash"],
                int(o["chunk_no"]),
                o["chunk_text"],
                [float(x) for x in o["_additional"]["vector"]],
            )
            for o in objs
        ]
        return self.spark.createDataFrame(rows, schema=CHUNKS)

    # -- VectorStoreBackend ----------------------------------------------

    def read_chunks(self) -> DataFrame:
        return self._to_df(self._graphql_get(None))

    def existing_doc_ids(self) -> DataFrame:
        seen = sorted({o["doc_id"] for o in self._graphql_get(None)})
        return self.spark.createDataFrame(
            [(d,) for d in seen], schema="doc_id string"
        )

    def delete_docs(self, doc_ids: list[str]) -> None:
        for doc_id in doc_ids:
            self._call(
                "v1/batch/delete",
                {
                    "match": {
                        "class": self.cls,
                        "where": {
                            "path": ["doc_id"],
                            "operator": "Equal",
                            "valueText": _safe_doc_id(doc_id),
                        },
                    }
                },
            )

    def _docs_present(self, doc_ids: list[str]) -> set[str]:
        present = set()
        for d in doc_ids:
            q = (
                f"{{ Get {{ {self.cls}(limit: 1, where: {self._where(d)}) "
                "{ doc_id } } }"
            )
            body = self._call("v1/graphql", {"query": q})
            if ((body.get("data") or {}).get("Get") or {}).get(self.cls):
                present.add(d)
        return present

    def upsert(self, chunks: DataFrame, reindex: bool = False) -> int:
        incoming = chunks.select(*CHUNK_COLS)
        ids = [r.doc_id for r in incoming.select("doc_id").distinct().collect()]
        if reindex:
            self.delete_docs(ids)
        else:
            present = self._docs_present(ids)
            if present:
                incoming = incoming.filter(~F.col("doc_id").isin(list(present)))
        url, cls = self.base_url, self.cls

        def build_request(points: list[dict]) -> tuple[str, dict]:
            import uuid

            return (
                f"{url}/v1/batch/objects",
                {
                    "objects": [
                        {
                            "class": cls,
                            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, p["id"])),
                            "properties": p["payload"],
                            "vector": p["vector"],
                        }
                        for p in points
                    ]
                },
            )

        return _distributed_point_upsert(
            incoming, self.batch_size, self.transport, self.headers, build_request
        )

    def _chunks_for_doc(self, doc_id: str) -> DataFrame:
        return self._to_df(self._graphql_get(self._where(doc_id)))

    def search_topk_request(
        self, doc_id: str, query_vec: list[float], k: int = 5
    ) -> tuple[str, dict]:
        """Server-side top-k as a GraphQL nearVector query (Weaviate
        ranks by vector distance and applies the where-filter
        remotely)."""
        vec = "[" + ", ".join(repr(float(x)) for x in query_vec) + "]"
        q = (
            f"{{ Get {{ {self.cls}(limit: {int(k)}, "
            f"nearVector: {{vector: {vec}}}, where: {self._where(doc_id)}) "
            "{ doc_id chunk_no chunk_text _additional { distance } } } }"
        )
        return "v1/graphql", {"query": q}


def make_fake_milvus_transport(state_dir: str):
    """File-backed Milvus v2 REST stand-in (same atomic-batch-file
    design as the qdrant/pinecone fakes, same race-tolerant rewrite)."""
    import json
    import os
    import re as _re
    import uuid

    os.makedirs(state_dir, exist_ok=True)

    def _merged() -> dict[str, dict]:
        rows: dict[str, dict] = {}
        for name in sorted(os.listdir(state_dir)):
            if name.endswith(".json"):
                try:
                    with open(os.path.join(state_dir, name)) as fh:
                        batch = json.load(fh)
                except FileNotFoundError:
                    continue
                for r in batch:
                    rows[str(r["id"])] = r
        return rows

    def _write_batch(rows: list[dict]) -> None:
        tmp = os.path.join(state_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(rows, fh)
        os.replace(tmp, os.path.join(state_dir, f"batch-{uuid.uuid4().hex}.json"))

    def _rewrite(rows: dict[str, dict]) -> None:
        import contextlib

        old = [n for n in os.listdir(state_dir) if n.endswith(".json")]
        _write_batch(list(rows.values()))
        for name in old:
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(state_dir, name))

    def _filter_doc(flt: str) -> str | None:
        if not flt:
            return None
        m = _re.fullmatch(r'doc_id == "([^"]*)"', flt)
        if not m:
            raise ValueError(f"fake milvus only supports doc_id filters: {flt}")
        return m.group(1)

    def transport(url: str, payload: dict, headers: dict) -> dict:
        if url.endswith("/collections/create"):
            return {"code": 0}
        if url.endswith("/entities/upsert"):
            _write_batch(payload["data"])
            return {"code": 0, "data": {"upsertCount": len(payload["data"])}}
        if url.endswith("/entities/query"):
            want = _filter_doc(payload.get("filter") or "")
            rows = sorted(
                (
                    r
                    for r in _merged().values()
                    if want is None or r.get("doc_id") == want
                ),
                key=lambda r: str(r["id"]),
            )
            start = int(payload.get("offset") or 0)
            limit = int(payload.get("limit") or 1024)
            return {"code": 0, "data": rows[start : start + limit]}
        if url.endswith("/entities/delete"):
            want = _filter_doc(payload["filter"])
            kept = {
                i: r for i, r in _merged().items() if r.get("doc_id") != want
            }
            _rewrite(kept)
            return {"code": 0}
        raise ValueError(f"unexpected milvus endpoint: {url}")

    return transport


def make_fake_weaviate_transport(state_dir: str):
    """File-backed Weaviate stand-in: batch/objects + batch/delete +
    a small GraphQL Get interpreter (enough grammar for the queries the
    backend emits — class, limit/offset, where doc_id Equal,
    _additional.vector)."""
    import json
    import os
    import re as _re
    import uuid

    os.makedirs(state_dir, exist_ok=True)

    def _merged() -> dict[str, dict]:
        objs: dict[str, dict] = {}
        for name in sorted(os.listdir(state_dir)):
            if name.endswith(".json"):
                try:
                    with open(os.path.join(state_dir, name)) as fh:
                        batch = json.load(fh)
                except FileNotFoundError:
                    continue
                for o in batch:
                    objs[str(o["id"])] = o
        return objs

    def _write_batch(objs: list[dict]) -> None:
        tmp = os.path.join(state_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(objs, fh)
        os.replace(tmp, os.path.join(state_dir, f"batch-{uuid.uuid4().hex}.json"))

    def _rewrite(objs: dict[str, dict]) -> None:
        import contextlib

        old = [n for n in os.listdir(state_dir) if n.endswith(".json")]
        _write_batch(list(objs.values()))
        for name in old:
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(state_dir, name))

    def _run_graphql(query: str) -> dict:
        m = _re.search(r"Get \{ (\w+)\(([^)]*)\)", query)
        if not m:
            raise ValueError(f"fake weaviate can't parse: {query}")
        cls, args = m.group(1), m.group(2)
        lim = _re.search(r"limit: (\d+)", args)
        off = _re.search(r"offset: (\d+)", args)
        want = _re.search(r'valueText: "([^"]*)"', args)
        objs = sorted(
            (
                o
                for o in _merged().values()
                if o["class"] == cls
                and (want is None or o["properties"]["doc_id"] == want.group(1))
            ),
            key=lambda o: str(o["id"]),
        )
        start = int(off.group(1)) if off else 0
        limit = int(lim.group(1)) if lim else 1024
        page = [
            {**o["properties"], "_additional": {"vector": o["vector"]}}
            for o in objs[start : start + limit]
        ]
        return {"data": {"Get": {cls: page}}}

    def transport(url: str, payload: dict, headers: dict) -> dict:
        if url.endswith("/v1/schema"):
            return {"class": payload["class"]}
        if url.endswith("/v1/batch/objects"):
            _write_batch(payload["objects"])
            return {"results": [{"status": "SUCCESS"}] * len(payload["objects"])}
        if url.endswith("/v1/graphql"):
            return _run_graphql(payload["query"])
        if url.endswith("/v1/batch/delete"):
            match = payload["match"]
            want = match["where"]["valueText"]
            kept = {
                i: o
                for i, o in _merged().items()
                if not (
                    o["class"] == match["class"]
                    and o["properties"]["doc_id"] == want
                )
            }
            _rewrite(kept)
            return {"results": {"successful": 1}}
        raise ValueError(f"unexpected weaviate endpoint: {url}")

    return transport


def make_fake_pinecone_transport(state_dir: str):
    """File-backed Pinecone data-plane stand-in (same design as the
    qdrant fake: atomically-renamed batch files so concurrent executor
    posts compose; last-write-wins per id)."""
    import json
    import os
    import uuid

    os.makedirs(state_dir, exist_ok=True)

    def _merged() -> dict[str, dict]:
        vecs: dict[str, dict] = {}
        for name in sorted(os.listdir(state_dir)):
            if name.endswith(".json"):
                # A concurrent _rewrite may unlink a file between the
                # listdir and the open — a real Pinecone's server-side
                # delete is atomic, so mirror that by skipping it.
                try:
                    with open(os.path.join(state_dir, name)) as fh:
                        batch = json.load(fh)
                except FileNotFoundError:
                    continue
                for v in batch:
                    vecs[str(v["id"])] = v
        return vecs

    def _write_batch(vectors: list[dict]) -> None:
        tmp = os.path.join(state_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(vectors, fh)
        os.replace(tmp, os.path.join(state_dir, f"batch-{uuid.uuid4().hex}.json"))

    def _rewrite(vectors: dict[str, dict]) -> None:
        # Delete-by-filter is atomic on a real server. Approximate that
        # here: snapshot the current batch files, land the merged
        # survivor batch FIRST (atomic rename), then unlink only the
        # snapshotted files — tolerating ones a racing _rewrite already
        # removed. Readers never observe an empty window, and two
        # concurrent rewriters converge to last-write-wins per id.
        import contextlib

        old = [n for n in os.listdir(state_dir) if n.endswith(".json")]
        _write_batch(list(vectors.values()))
        for name in old:
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(state_dir, name))

    def transport(url: str, payload: dict, headers: dict) -> dict:
        if url.endswith("/vectors/upsert"):
            _write_batch(payload["vectors"])
            return {"upsertedCount": len(payload["vectors"])}
        if url.endswith("/vectors/list"):
            prefix = payload.get("prefix") or ""
            hits = sorted(i for i in _merged() if i.startswith(prefix))
            start = int(payload.get("paginationToken") or 0)
            limit = int(payload.get("limit") or 100)
            page = hits[start : start + limit]
            nxt = start + limit if start + limit < len(hits) else None
            out = {"vectors": [{"id": i} for i in page]}
            if nxt is not None:
                out["pagination"] = {"next": str(nxt)}
            return out
        if url.endswith("/vectors/fetch"):
            merged = _merged()
            return {
                "vectors": {
                    i: merged[i] for i in payload.get("ids") or [] if i in merged
                }
            }
        if url.endswith("/vectors/delete"):
            flt = payload.get("filter") or {}
            want = (flt.get("doc_id") or {}).get("$eq")
            kept = {
                i: v
                for i, v in _merged().items()
                if v["metadata"].get("doc_id") != want
            }
            _rewrite(kept)
            return {}
        raise ValueError(f"unexpected pinecone endpoint: {url}")

    return transport


def make_fake_qdrant_transport(state_dir: str):
    """File-backed Qdrant REST stand-in. Point batches land as one
    atomically-renamed JSON file each, so concurrent posts from many
    Spark *worker processes* compose without locks — which is exactly
    what lets the distributed mapInPandas upsert be exercised for real
    in tests (an in-memory dict would silently vanish across the
    executor process boundary). Scroll/delete/search read the merged
    state; last-write-wins per point id mirrors Qdrant upsert
    semantics."""
    import json
    import os
    import uuid

    os.makedirs(state_dir, exist_ok=True)

    def _merged() -> dict[str, dict]:
        points: dict[str, dict] = {}
        for name in sorted(os.listdir(state_dir)):
            if not name.endswith(".json"):
                continue
            # A racing _rewrite may have unlinked this file after the
            # listdir; a real Qdrant's delete-by-filter is atomic
            # server-side, so skipping the vanished file mirrors what a
            # live deployment would observe.
            try:
                with open(os.path.join(state_dir, name)) as fh:
                    batch = json.load(fh)
            except FileNotFoundError:
                continue
            for p in batch:
                points[str(p["id"])] = p
        return points

    def _rewrite(points: dict[str, dict]) -> None:
        # Land the merged survivor batch first (atomic rename), then
        # unlink only the files that existed before it — so concurrent
        # readers/rewriters never see an empty store and the loser of a
        # remove race just skips the already-gone file.
        import contextlib

        old = [n for n in os.listdir(state_dir) if n.endswith(".json")]
        _write_batch(list(points.values()))
        for name in old:
            with contextlib.suppress(FileNotFoundError):
                os.remove(os.path.join(state_dir, name))

    def _write_batch(points: list[dict]) -> None:
        tmp = os.path.join(state_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(points, fh)
        os.replace(tmp, os.path.join(state_dir, f"batch-{uuid.uuid4().hex}.json"))

    def _matches(p: dict, flt: dict | None) -> bool:
        for cond in (flt or {}).get("must", []):
            if p["payload"].get(cond["key"]) != cond["match"]["value"]:
                return False
        return True

    def transport(url: str, payload: dict, headers: dict) -> dict:
        if url.endswith("/points"):
            _write_batch(payload["points"])
            return {"result": {"status": "acknowledged"}}
        if url.endswith("/points/scroll"):
            flt = payload.get("filter")
            hits = sorted(
                (p for p in _merged().values() if _matches(p, flt)),
                key=lambda p: str(p["id"]),
            )
            start = int(payload.get("offset") or 0)
            limit = int(payload.get("limit") or 1024)
            page = hits[start : start + limit]
            nxt = start + limit if start + limit < len(hits) else None
            return {"result": {"points": page, "next_page_offset": nxt}}
        if url.endswith("/points/delete"):
            flt = payload.get("filter")
            kept = {
                pid: p for pid, p in _merged().items() if not _matches(p, flt)
            }
            _rewrite(kept)
            return {"result": {"status": "acknowledged"}}
        if url.rstrip("/").endswith(("/collections", "collections")) or "/collections/" in url:
            return {"result": True}  # ensure-collection is a no-op here
        raise ValueError(f"unexpected qdrant endpoint: {url}")

    return transport


# -- backend registry (the adapters/vectordb registration surface) -------

_BACKENDS: dict[str, type] = {}


def register_backend(kind: str):
    """Reference parity: vector-db adapters self-register under an id
    (adapters/vectordb/register.py; e.g. qdrant's get_id 'qdrant|41f6...').
    Ours key on a plain kind string."""

    def deco(cls):
        if kind in _BACKENDS:
            raise ValueError(f"vector-store backend {kind!r} already registered")
        _BACKENDS[kind] = cls
        return cls

    return deco


def make_vector_store(kind: str, spark: SparkSession, **config) -> VectorStoreBackend:
    """Instantiate a vector store by kind.

    Mapping to the reference's six adapters: `postgres`/`supabase` are
    pgvector-over-JDBC (`jdbc` here — Supabase IS hosted Postgres with
    pgvector); the four point-store services each speak their own wire
    spelling behind the same transport seam — `rest` (Qdrant REST),
    `pinecone` (data-plane JSON), `milvus` (RESTful v2), `weaviate`
    (REST objects + GraphQL); `parquet` is the in-engine 100 TB path
    with no reference equivalent.
    """
    cls = _BACKENDS.get(kind)
    if cls is None:
        available = ", ".join(sorted(_BACKENDS)) or "(none)"
        raise KeyError(f"unknown vector store {kind!r}. Available: {available}")
    return cls(spark, **config)


def list_backends() -> list[str]:
    return sorted(_BACKENDS)


def _parquet_factory(spark: SparkSession, **config):
    # lazy: operators.index_store imports this module for the
    # VectorStoreBackend interface, so importing it at module load
    # would be circular
    from unstract_spark.operators.index_store import VectorIndexStore

    return VectorIndexStore(spark, **config)


register_backend("jdbc")(JdbcVectorStore)
register_backend("rest")(RestVectorStore)
register_backend("pinecone")(PineconeVectorStore)
register_backend("milvus")(MilvusVectorStore)
register_backend("weaviate")(WeaviateVectorStore)
register_backend("parquet")(_parquet_factory)
