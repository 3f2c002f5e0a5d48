"""Execute every ```python block in EXAMPLES.md verbatim, in order,
in one shared namespace — the doc is a test."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    src = open("/root/repo/EXAMPLES.md").read()
    blocks = re.findall(r"```python\n(.*?)```", src, re.S)
    ns: dict = {}
    for i, block in enumerate(blocks):
        print(f"-- block {i + 1}/{len(blocks)} ({len(block.splitlines())} lines)")
        exec(compile(block, f"EXAMPLES.md#block{i + 1}", "exec"), ns)
    # light sanity on the artifacts the blocks left behind
    assert ns["bindings"].count() > 0
    assert ns["comp"].count() > 0
    assert ns["survivors"].count() > 0
    assert ns["card"]["estimate_r"] > 0
    assert ns["components"].count() == ns["comp"].count()
    assert ns["top_convs"].count() <= 5
    assert ns["train"].count() > 0
    assert ns["hits"].count() > 0
    assert ns["framed"]["conversation"]["name"] == "support thread"
    assert ns["quants"].count() == 3
    assert ns["in_window"].count() >= 0
    assert ns["vf"].count() == 8
    assert ns["utterances"].count() > 0
    assert ns["decontam_clean"].count() > 0
    assert ns["sparql_ok"].count() > 0
    assert ns["owl_closed"].count() > ns["adj_triples"].count()
    assert ns["pairs"].count() > 0 and ns["n2v"].count() > 0
    assert ns["negs"].count() > 0
    assert ns["nodes"].count() > ns["edges"].select("src").distinct().count()
    assert ns["hot"].count() == 6 and ns["stats"].count() == 2
    assert ns["url_groups"].count() == 1   # both variants canonicalize equal
    assert ns["chunk_groups"].count() > 0 and ns["scores"].count() > 0
    assert ns["thumbs"].count() == 8
    print("EXAMPLES.md: all blocks executed, sanity checks pass")


if __name__ == "__main__":
    main()
