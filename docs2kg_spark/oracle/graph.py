"""Oracle for graph materialization: a faithful reimplementation of the
reference's imperative header-stack parenting and NEXT linkage
(utils/neo4j_loader.py:272-364) used to validate the window-function
version in operators/graph.py.
"""

from __future__ import annotations

from docs2kg_spark.oracle.reference import det_id

LAYOUT_SCHEMA = {"H1": ("P", "CODE"), "P": ("CODE",)}


def layout_edges_oracle(segments: list[dict]) -> list[tuple]:
    """segments: dicts with conv_id, seg_id, seg_idx, label — MUST be the
    full ordered segment list per conversation.  Returns edge tuples
    (src, dst, type) reproducing _create_layout/_find_parent_node."""
    edges = []
    by_conv: dict[str, list[dict]] = {}
    for s in segments:
        by_conv.setdefault(s["conv_id"], []).append(s)
    for conv_id, segs in by_conv.items():
        segs = sorted(segs, key=lambda s: s["seg_idx"])
        file_id = det_id("file", conv_id)
        header_stack: list[tuple[str, str]] = []  # (label, seg_id)
        processed: list[dict] = []
        for item in segs:
            label = item["label"]
            parent_id = None
            if label.startswith("H") and len(label) == 2 and label[1].isdigit():
                level = int(label[1])
                while header_stack and int(header_stack[-1][0][1]) >= level:
                    header_stack.pop()
                parent_id = header_stack[-1][1] if header_stack else None
            else:
                if processed:
                    prev = processed[-1]
                    if prev["label"] in LAYOUT_SCHEMA and label in LAYOUT_SCHEMA[prev["label"]]:
                        parent_id = prev["seg_id"]
                    elif header_stack:
                        parent_id = header_stack[-1][1]
            edges.append((parent_id or file_id, item["seg_id"], "CONTAINS"))
            if label.startswith("H") and len(label) == 2 and label[1].isdigit():
                header_stack.append((label, item["seg_id"]))
            processed.append(item)
            if len(processed) > 1 and processed[-2]["label"] == label:
                edges.append((processed[-2]["seg_id"], item["seg_id"], "NEXT"))
    return edges
