"""CLI, mirroring the reference's `json-ld` binary
(crates/cli/src/main.rs:84-180: expand / flatten / compact commands
printing pretty JSON, toRdf printing N-Quads) plus fromrdf.

Usage:
  python -m json_ld_spark expand  doc.json [--base IRI] [--context ctx.json]
  python -m json_ld_spark flatten doc.json [--base IRI]
  python -m json_ld_spark compact doc.json --context ctx.json
  python -m json_ld_spark tordf   doc.json [--rdf-direction MODE] [--generalized]
  python -m json_ld_spark fromrdf triples.json   # engine quad tuples JSON

Context IRIs in documents resolve through --mount PREFIX=DIR options
(the reference's FsLoader mount); --http additionally enables the
driver-side HTTP loader (httploader.py, ReqwestLoader parity) as the
fallback in the chain — mounts always win, and without --http there is
no network access ever.
"""

from __future__ import annotations

import argparse
import json
import sys

from .api import compact, expand, flatten, from_rdf, to_rdf
from .context import chain_loader, fs_loader, no_loader
from .options import JsonLdOptions
from .rdf import to_nquads


def _build_options(args) -> JsonLdOptions:
    loaders = []
    if args.mount:
        mounts = dict(m.split("=", 1) for m in args.mount)
        loaders.append(fs_loader(mounts))
    if getattr(args, "http", False):
        from .httploader import HttpLoader

        loaders.append(HttpLoader().context_loader())
    loader = chain_loader(*loaders) if loaders else no_loader
    expand_context = None
    if getattr(args, "expand_context", None):
        expand_context = json.load(open(args.expand_context))
    return JsonLdOptions(
        base=args.base,
        loader=loader,
        expand_context=expand_context,
        rdf_direction=getattr(args, "rdf_direction", None),
        produce_generalized_rdf=getattr(args, "generalized", False),
        ordered=True,
        policy_vocab=(
            "reject" if getattr(args, "no_vocab", False) else "keep"
        ),
        allow_undefined=not getattr(args, "no_undef", False),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="json_ld_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("expand", "flatten", "compact", "tordf", "fromrdf", "frame"):
        p = sub.add_parser(name)
        p.add_argument("input", help="input file, or - for stdin")
        p.add_argument("--base", default=None)
        p.add_argument("--mount", action="append", default=[],
                       help="PREFIX=DIR context mount (repeatable)")
        p.add_argument("--http", action="store_true",
                       help="enable driver-side HTTP context loading "
                            "(fallback after mounts)")
        p.add_argument("--expand-context", default=None)
        if name == "compact":
            p.add_argument("--context", required=True)
        if name == "frame":
            p.add_argument("--frame", required=True,
                           help="frame document (JSON file)")
        if name == "tordf":
            p.add_argument("--rdf-direction", default=None,
                           choices=["i18n-datatype", "compound-literal"])
            p.add_argument("--generalized", action="store_true")
        if name == "expand":
            # reference CLI parity (crates/cli/src/main.rs:34-51)
            p.add_argument("--no-vocab", action="store_true",
                           help="reject terms expanded via @vocab "
                                "(reference --no-vocab)")
            p.add_argument("--no-undef", action="store_true",
                           help="error on keys with no IRI mapping "
                                "instead of dropping (reference "
                                "--no-undef)")
            p.add_argument("-l", "--relabel", action="store_true",
                           help="give every node an @id; blank ids "
                                "relabeled _:b0, _:b1, ... (reference "
                                "--relabel)")
            p.add_argument("-c", "--canonicalize", action="store_true",
                           help="canonical number form (with --relabel: "
                                "relabel_and_canonicalize)")

    fp = sub.add_parser("fetch", help="download and pretty-print a remote "
                                      "JSON-LD document (reference fetch)")
    fp.add_argument("url")

    sp = sub.add_parser(
        "sparql",
        help="run a SPARQL query (file or inline) against an N-Quads "
             "file/dir through a local Spark session",
    )
    sp.add_argument("query", help="query file, inline query text, or -")
    sp.add_argument("--data", required=True, help="N-Quads file or dir")
    sp.add_argument("--update", action="store_true",
                    help="treat the input as DELETE/INSERT WHERE update "
                         "text and print the updated graph as N-Quads")

    args = ap.parse_args(argv)
    if args.cmd == "sparql":
        return _run_sparql(args)
    if args.cmd == "fetch":
        from .httploader import HttpLoader

        remote = HttpLoader().load(args.url)
        print(json.dumps(remote.document, indent=2, ensure_ascii=False))
        return 0
    opts = _build_options(args)

    is_url = args.input.startswith(("http://", "https://"))
    if args.cmd == "expand" and getattr(args, "http", False) and is_url:
        # remote-document expansion (reference `json-ld expand <url>`;
        # Link-header context + final-URL base semantics in api.expand_url)
        from .api import expand_url

        print(json.dumps(expand_url(args.input, options=opts), indent=2,
                         ensure_ascii=False))
        return 0

    if is_url:
        if getattr(args, "http", False):
            # route URL inputs through the HTTP loader for the other
            # subcommands too (they then process the fetched document;
            # expand_url above additionally applies Link-header context)
            from .httploader import HttpLoader

            remote = HttpLoader().load(args.input)
            doc = remote.document
        else:
            print(
                f"{args.cmd}: {args.input!r} is a URL; pass --http to "
                "fetch remote documents",
                file=sys.stderr,
            )
            return 2
    else:
        raw = sys.stdin.read() if args.input == "-" else open(args.input).read()
        doc = json.loads(raw)

    if args.cmd == "expand":
        out = expand(doc, options=opts)
        if getattr(args, "relabel", False):
            from .canonicalize import relabel_expanded

            out = relabel_expanded(
                out, canonicalize=getattr(args, "canonicalize", False)
            )
        elif getattr(args, "canonicalize", False):
            from .canonicalize import canonicalize_expanded

            out = canonicalize_expanded(out)
        print(json.dumps(out, indent=2, ensure_ascii=False))
    elif args.cmd == "flatten":
        print(json.dumps(flatten(doc, options=opts), indent=2, ensure_ascii=False))
    elif args.cmd == "compact":
        ctx = json.load(open(args.context))
        print(json.dumps(compact(doc, ctx, options=opts), indent=2, ensure_ascii=False))
    elif args.cmd == "tordf":
        sys.stdout.write(to_nquads(to_rdf(doc, options=opts)))
    elif args.cmd == "frame":
        from .frame import frame as _frame

        fr = json.load(open(args.frame))
        print(json.dumps(_frame(doc, fr, options=opts), indent=2,
                         ensure_ascii=False))
    elif args.cmd == "fromrdf":
        quads = [tuple(q) for q in doc]
        print(json.dumps(from_rdf(quads, options=opts), indent=2, ensure_ascii=False))
    return 0


def _run_sparql(args) -> int:
    """CLI query runner: N-Quads in, TSV bindings (or N-Quads for
    CONSTRUCT/DESCRIBE/--update, 'yes'/'no' for ASK) out."""
    import os

    q = args.query
    if q == "-":
        q = sys.stdin.read()
    elif os.path.exists(q):
        q = open(q).read()

    from pyspark.sql import functions as F  # noqa: F401

    from .session import get_spark
    from .sources.nquads import read_nquads
    from .sparql import sparql, sparql_update

    spark = get_spark()
    quads = read_nquads(spark, args.data)
    # queries keep the graph column (GRAPH-clause support; plain
    # patterns ignore it — union-default-graph semantics); UPDATE works
    # on the 3-col merged view, its output being a plain graph
    tri4 = quads.select("graph", "subj", "pred", "obj").dropDuplicates()
    tri3 = quads.select("subj", "pred", "obj").dropDuplicates()

    # results print as TSV (term-lexical, like the 3-col triple view);
    # ASK prints yes/no
    res = sparql_update(tri3, q) if args.update else sparql(tri4, q)
    if isinstance(res, bool):
        print("yes" if res else "no")
        return 0
    cols = res.columns
    print("\t".join(cols))
    key = lambda t: tuple("" if x is None else str(x) for x in t)
    for row in sorted((tuple(r) for r in res.collect()), key=key):
        print("\t".join("" if v is None else str(v) for v in row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
