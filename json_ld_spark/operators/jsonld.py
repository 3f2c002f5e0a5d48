"""Spark stages for the JSON-LD pipeline: expand / flatten / triples.

Architecture (SURVEY.md §1.3, §3.3): document-local algorithms (expansion,
node-map walk, quad emission) run inside Arrow-batched `mapInPandas`
iterators — one Python call per partition batch, never per row crossing
the JVM boundary. Cross-document work (node merge, dedup, linking,
canonicalization) is DataFrame-native in the other operator modules.

Blank-node determinism: inside each document the sequential generator
produces the reference's labels ("b0", "b1", …;
crates/core/src/flattening/environment.rs); before documents merge into
the corpus triple table each label is prefixed with a hash of the doc_id
(SURVEY.md §1.3 "Generator" row), so labels are globally unique and
deterministic with no cross-partition coordination.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..canonicalize import canonicalize_quads
from ..context import ActiveContext, Loader, dict_loader, no_loader, process_context
from ..expand import expand_document
from ..nodemap import BlankGen, flatten_expanded
from ..options import JsonLdOptions, options_payload
from ..rdf import expanded_to_quads

try:  # orjson is ~5x stdlib json for parse; fall back transparently
    import orjson

    def _loads(s: str) -> Any:
        return orjson.loads(s)

except ImportError:  # pragma: no cover
    def _loads(s: str) -> Any:
        return json.loads(s)


TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("graph", T.StringType(), True),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj_kind", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("datatype", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

EXPANDED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("expanded", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("n_warnings", T.IntegerType(), False),
    ]
)

FLATTENED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("node_json", T.StringType(), True),
        T.StructField("node_id", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

# module-level cache: processed active contexts per (ctx_json, base, mode)
_CTX_CACHE: dict[tuple, ActiveContext] = {}


def _active_context(
    ctx_json: Optional[str],
    base: Optional[str],
    processing_mode: str,
    registry: Optional[dict],
) -> ActiveContext:
    key = (ctx_json, base, processing_mode)
    got = _CTX_CACHE.get(key)
    if got is None:
        active = ActiveContext(base_iri=base, original_base_url=base)
        if ctx_json:
            loader: Loader = dict_loader(registry) if registry else no_loader
            active = process_context(
                active,
                json.loads(ctx_json),
                base,
                loader=loader,
                processing_mode=processing_mode,
            )
        _CTX_CACHE[key] = active
        got = active
    return got


def _doc_hash_prefix(doc_id: str) -> str:
    return hashlib.sha256(doc_id.encode("utf-8")).hexdigest()[:12]


def _globalize_label(label: str, prefix: str) -> str:
    # "_:b0" -> "_:g<dochash>b0": globally unique, deterministic
    return f"_:g{prefix}{label[2:]}"


def expand_stage(
    df: DataFrame,
    context: Any = None,
    options: JsonLdOptions | None = None,
    context_registry: dict | None = None,
    doc_col: str = "doc",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc JSON column → expanded JSON column (errors captured per row,
    not poisoning the batch — the quarantine pattern of SURVEY.md §2 D3)."""
    opts = options or JsonLdOptions()
    ctx_json = json.dumps(context) if context is not None else None
    base = opts.base
    mode = opts.processing_mode
    payload = options_payload(opts)
    registry = context_registry

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local_opts = JsonLdOptions(
            **payload,
            loader=dict_loader(registry) if registry else no_loader,
        )
        active = _active_context(ctx_json, base, mode, registry)
        for pdf in batches:
            out_ids, out_exp, out_err, out_warn = [], [], [], []
            for doc_id, doc in zip(pdf[id_col], pdf[doc_col]):
                try:
                    expanded, warnings = expand_document(
                        _loads(doc), active, local_opts, base
                    )
                    out_exp.append(json.dumps(expanded, ensure_ascii=False))
                    out_err.append(None)
                    out_warn.append(len(warnings))
                except Exception as ex:  # noqa: BLE001 - quarantine row
                    out_exp.append(None)
                    out_err.append(f"{type(ex).__name__}: {ex}")
                    out_warn.append(0)
                out_ids.append(doc_id)
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "expanded": out_exp,
                    "error": out_err,
                    "n_warnings": pd.array(out_warn, dtype="int32"),
                }
            )

    return df.mapInPandas(run, schema=EXPANDED_SCHEMA)


def triples_stage(
    df: DataFrame,
    context: Any = None,
    options: JsonLdOptions | None = None,
    context_registry: dict | None = None,
    doc_col: str = "doc",
    id_col: str = "doc_id",
    globalize_bnodes: bool = True,
    canonical_bnodes: bool = False,
) -> DataFrame:
    """doc JSON column → triple rows (the full §3.3 flagship path:
    expand → node map → quads, one fused Arrow pass per partition).

    globalize_bnodes: hash-prefix per-doc labels for the corpus graph.
    canonical_bnodes: content-hash canonical labels (golden comparison).
    """
    opts = options or JsonLdOptions()
    ctx_json = json.dumps(context) if context is not None else None
    base, mode = opts.base, opts.processing_mode
    rdf_direction = opts.rdf_direction
    generalized = opts.produce_generalized_rdf
    payload = options_payload(opts)
    registry = context_registry

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local_opts = JsonLdOptions(
            **payload,
            loader=dict_loader(registry) if registry else no_loader,
        )
        active = _active_context(ctx_json, base, mode, registry)
        for pdf in batches:
            rows: dict[str, list] = {k.name: [] for k in TRIPLE_SCHEMA.fields}
            # tolist() beats Series.__iter__ by ~2x for string columns
            for doc_id, doc in zip(pdf[id_col].tolist(), pdf[doc_col].tolist()):
                try:
                    expanded, _w = expand_document(
                        _loads(doc), active, local_opts, base
                    )
                    quads = expanded_to_quads(
                        expanded,
                        rdf_direction=rdf_direction,
                        produce_generalized_rdf=generalized,
                        gen=BlankGen(),
                        mutate_ok=True,
                    )
                except Exception:  # noqa: BLE001 - skip bad doc
                    continue
                if canonical_bnodes:
                    quads = canonicalize_quads(quads)
                elif globalize_bnodes:
                    prefix = _doc_hash_prefix(str(doc_id))
                    quads = [
                        tuple(
                            _globalize_label(t, prefix)
                            if isinstance(t, str) and t.startswith("_:")
                            else t
                            for t in q
                        )
                        for q in quads
                    ]
                for graph, subj, pred, kind, obj, dt, lang in quads:
                    rows["doc_id"].append(doc_id)
                    rows["graph"].append(graph)
                    rows["subj"].append(subj)
                    rows["pred"].append(pred)
                    rows["obj_kind"].append(kind)
                    rows["obj"].append(obj)
                    rows["datatype"].append(dt)
                    rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=TRIPLE_SCHEMA)


def flatten_stage(
    df: DataFrame,
    context: Any = None,
    options: JsonLdOptions | None = None,
    context_registry: dict | None = None,
    doc_col: str = "doc",
    id_col: str = "doc_id",
) -> DataFrame:
    """doc → one row per flattened node (expanded → node map → flat)."""
    opts = options or JsonLdOptions()
    ctx_json = json.dumps(context) if context is not None else None
    base, mode = opts.base, opts.processing_mode
    payload = options_payload(opts)
    registry = context_registry

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local_opts = JsonLdOptions(
            **payload,
            loader=dict_loader(registry) if registry else no_loader,
        )
        active = _active_context(ctx_json, base, mode, registry)
        for pdf in batches:
            ids, nodes, node_ids, errs = [], [], [], []
            for doc_id, doc in zip(pdf[id_col], pdf[doc_col]):
                try:
                    expanded, _w = expand_document(
                        _loads(doc), active, local_opts, base
                    )
                    flat = flatten_expanded(expanded, ordered=True, gen=BlankGen())
                    for node in flat:
                        ids.append(doc_id)
                        nodes.append(json.dumps(node, ensure_ascii=False))
                        node_ids.append(node.get("@id"))
                        errs.append(None)
                except Exception as ex:  # noqa: BLE001
                    ids.append(doc_id)
                    nodes.append(None)
                    node_ids.append(None)
                    errs.append(f"{type(ex).__name__}: {ex}")
            yield pd.DataFrame(
                {"doc_id": ids, "node_json": nodes, "node_id": node_ids, "error": errs}
            )

    return df.mapInPandas(run, schema=FLATTENED_SCHEMA)


FRAMED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("framed", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def frame_stage(
    df: DataFrame,
    frame_doc: dict,
    context: Any = None,
    options: JsonLdOptions | None = None,
    context_registry: dict | None = None,
    doc_col: str = "doc",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed JSON-LD framing (frame.py — beyond-reference: the
    reference workspace has no framing crate): per-document
    expand → frame → compact against the frame's context.

    The frame is an authored document (small by construction), so it is
    frame-expanded ONCE on the driver and shipped to executors as plain
    JSON in the task closure — per-row work is document-local, the
    stage is a mapInPandas projection with no shuffle, and output JSON
    is key-sorted so byte-equality is partition-invariant."""
    from ..api import expand as _expand
    from ..frame import finalize_framed, frame_expanded

    opts = options or JsonLdOptions()
    frame_opts = opts.with_(
        frame_expansion=True,
        loader=dict_loader(context_registry) if context_registry else no_loader,
    )
    expanded_frame_json = json.dumps(_expand(frame_doc, frame_opts, opts.base))
    frame_ctx_json = json.dumps(
        frame_doc.get("@context") if isinstance(frame_doc, dict) else None
    )
    ctx_json = json.dumps(context) if context is not None else None
    base, mode = opts.base, opts.processing_mode
    payload = options_payload(opts)
    registry = context_registry

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local_opts = JsonLdOptions(
            **payload,
            loader=dict_loader(registry) if registry else no_loader,
        )
        expanded_frame = json.loads(expanded_frame_json)
        frame_ctx = json.loads(frame_ctx_json)
        active = _active_context(ctx_json, base, mode, registry)
        for pdf in batches:
            ids, outs, errs = [], [], []
            for doc_id, doc in zip(pdf[id_col], pdf[doc_col]):
                try:
                    expanded, _w = expand_document(
                        _loads(doc), active, local_opts, base
                    )
                    framed = frame_expanded(expanded, expanded_frame, local_opts)
                    result = finalize_framed(framed, frame_ctx, local_opts, base)
                    outs.append(
                        json.dumps(result, ensure_ascii=False, sort_keys=True)
                    )
                    errs.append(None)
                except Exception as ex:  # noqa: BLE001 - quarantine row
                    outs.append(None)
                    errs.append(f"{type(ex).__name__}: {ex}")
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "framed": outs, "error": errs})

    return df.mapInPandas(run, schema=FRAMED_SCHEMA)


def from_rdf_stage(
    triples: DataFrame,
    group_col: str = "doc_id",
    options: "JsonLdOptions | None" = None,
) -> DataFrame:
    """Inverse of triples_stage: corpus triple table → one expanded
    JSON-LD document per group (fromrdf.py, reference
    serialization.rs:238-392), via applyInPandas per group.

    Scale shape: the shuffle key is the document/conversation id, so
    group state is one document's quads — bounded memory per task
    regardless of corpus size. List folding and literal decoding are
    group-local; no cross-group state.
    """
    opts = options or JsonLdOptions()
    ordered = opts.ordered
    rdf_direction = opts.rdf_direction
    native = opts.use_native_types
    use_rdf_type = opts.use_rdf_type

    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType(), False),
            T.StructField("expanded", T.StringType(), True),
        ]
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..fromrdf import from_rdf

        quads = [
            (
                None if g is None or (isinstance(g, float)) else g,
                s, p, k, o,
                None if dt is None or (isinstance(dt, float)) else dt,
                None if lg is None or (isinstance(lg, float)) else lg,
            )
            for g, s, p, k, o, dt, lg in zip(
                pdf["graph"], pdf["subj"], pdf["pred"], pdf["obj_kind"],
                pdf["obj"], pdf["datatype"], pdf["lang"],
            )
        ]
        doc = from_rdf(
            quads, ordered=ordered, rdf_direction=rdf_direction,
            use_native_types=native, use_rdf_type=use_rdf_type,
        )
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "expanded": [json.dumps(doc, ensure_ascii=False)],
            }
        )

    return triples.groupBy(group_col).applyInPandas(assemble, schema=out_schema)


def node_table(triples: DataFrame) -> DataFrame:
    """Corpus node table from the triple table — the distributed
    `merge_node` (crates/core/src/flattening/node_map.rs:211-262) as ONE
    hash aggregation: types concat-distinct, predicate set, degree.

    Plan note: n_docs uses size(collect_set(...)) instead of
    count_distinct — count_distinct expands to a second aggregate keyed
    by (graph, subj, doc_id) and costs an extra Exchange; collect_set
    fuses into the same ObjectHashAggregate. Callers that pre-partition
    by subj (build_kg) get dedup + merge with a single shuffle total:
    HashPartitioning(subj) satisfies the ClusteredDistribution of both
    the 7-column dedup keys and the (graph, subj) merge keys.
    """
    return (
        triples.groupBy("graph", "subj")
        .agg(
            F.array_sort(
                F.array_distinct(
                    F.collect_list(F.when(F.col("pred") == F.lit(RDF_TYPE_IRI), F.col("obj")))
                )
            ).alias("types"),
            F.array_sort(F.array_distinct(F.collect_list("pred"))).alias("preds"),
            F.count(F.lit(1)).alias("out_degree"),
            F.size(F.collect_set("doc_id")).cast("long").alias("n_docs"),
        )
        .withColumnRenamed("subj", "node_id")
    )


RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def dedup_triples(triples: DataFrame) -> DataFrame:
    """ExpandedDocument set semantics at corpus level: exact-duplicate
    quads collapse (dropDuplicates = hash-partitioned distinct)."""
    return triples.dropDuplicates(
        ["graph", "subj", "pred", "obj_kind", "obj", "datatype", "lang"]
    )
