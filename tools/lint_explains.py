#!/usr/bin/env python3
"""Physical-plan lint over the EXPLAINS.md dump (graft.Explain output).

Scans every query's formatted plan for the scale anti-patterns that have
bitten this repo before (a q87 single-partition ntile window shipped green
for three rounds because nothing audited the plans):

  1. `Exchange SinglePartition` feeding a Window or Sort — the global-window
     trap: one task sorts data that grows with the input. A SinglePartition
     exchange feeding a final scalar HashAggregate is fine (it carries P
     partial rows, not data).
  2. `CartesianProduct` anywhere.
  3. `BroadcastNestedLoopJoin` whose broadcast side is not provably scalar
     (a global aggregate with `Keys: []` producing one row).

Bounded-by-construction exceptions are declared in ALLOW with the reason —
the lint prints them as `allowed` so the judgment stays visible.

Usage: python3 tools/lint_explains.py [EXPLAINS.md]
Exit 1 if any un-allowed finding exists.
"""
import re
import sys

# query -> (pattern substring, reason the shape is bounded)
ALLOW = {
    "q163_curation_funnel": [
        ("BNLJ-nonscalar",
         "q149's 1-row exact-rank threshold broadcast (HashAggregate "
         "Keys:[] (223) -> Filter isnotnull -> Project -> "
         "BroadcastExchange IdentityBroadcastMode (226) -> the lm keep "
         "cut), scalar by construction and detector-verified in q149's "
         "own section; here the SAME subtree renders nested inside the "
         "cached LM-survivor InMemoryRelation's AdaptiveSparkPlan block, "
         "whose '== Final Plan ==' lines drop the ':' continuation "
         "column, so the child-indent walk cannot reach the broadcast "
         "side to prove it scalar (detector limitation, not a plan "
         "shape; NgramLm.flagged / CurationFunnel.stages)"),
    ],
    "q170_funnel_spliced": [
        ("BNLJ-nonscalar",
         "the SAME q149 1-row exact-rank threshold broadcast as "
         "q163's allowance (HashAggregate Keys:[] (340) -> SinglePartition "
         "Exchange -> Filter isnotnull -> Project -> BroadcastExchange "
         "IdentityBroadcastMode (345) -> the lm keep cut at node 346), "
         "scalar by construction; q170 is q163's chain with the "
         "decontamination stage spliced, so the identical subtree renders "
         "nested inside the cached LM-survivor InMemoryRelation's "
         "AdaptiveSparkPlan block where the child-indent walk cannot reach "
         "the broadcast side (same detector limitation, not a plan shape; "
         "NgramLm.flagged / CurationFunnel.stagesOf)"),
    ],
    "q177_pii_funnel": [
        ("BNLJ-nonscalar",
         "the SAME q149 1-row exact-rank threshold broadcast as q163/q170's "
         "allowances (node 274: Cross join on lm_score_per_tok >= __thr, "
         "the broadcast side a Keys:[] exact-rank aggregate), scalar by "
         "construction; q177 is q163's chain with the PII stage spliced, so "
         "the identical subtree renders nested inside the cached "
         "LM-survivor InMemoryRelation's AdaptiveSparkPlan block where the "
         "child-indent walk cannot reach the broadcast side (same detector "
         "limitation, not a plan shape; NgramLm.flagged / "
         "CurationFunnel.stagesOf + piiStage)"),
    ],
    "q120_guarded_join": [
        ("BNLJ-nonscalar",
         "the guard's null-safe semi-join evaluated on the SINGLE synthetic "
         "null-keyed dim row: the streamed side is one literal row "
         "(Range(1) -> Project), the broadcast side the checked dim-key "
         "frame - dim-sized, the same bound as every dim broadcast in the "
         "repo; the real-keyed branch of the union hashes normally. Cost "
         "is <= |dim| comparisons once, independent of fact volume"),
    ],
    "q24_cosine_topk": [
        ("BNLJ-nonscalar",
         "broadcast side is the QUERY vector set (bounded |Q|, filtered "
         "before broadcast); corpus x queries with a non-equi self-exclusion "
         "is the brute-force baseline's defining shape (Similarity.scala)"),
    ],
    "q134_hybrid_rrf": [
        ("BNLJ-nonscalar",
         "the dense leg IS q24's CosineTopK shape: broadcast side is the "
         "query embedding set (bounded |Q|=3, filtered before broadcast) "
         "against the corpus with a non-equi self-exclusion; the sparse "
         "BM25 leg hashes normally (Rrf.scala composes the two legs' own "
         "scale paths)"),
    ],
    "q146_semantic_adaptive": [
        ("BNLJ-nonscalar",
         "the derived-corpus replication: 500 base embeddings crossJoin a "
         "BROADCAST 132-row literal replica range (ScaleUp's decorrelated "
         "replication as a query) - both sides knob-bounded constants of "
         "the gate, never data volume (IvfQueries.q146SemanticAdaptiveTwoLevel)"),
    ],
    "q144_projected_topk": [
        ("BNLJ-nonscalar",
         "q24's CosineTopK shape over the PROJECTED frame: broadcast side "
         "is the bounded query set (|Q|=10, filtered before broadcast) "
         "against the 16-dim reduced corpus with a non-equi "
         "self-exclusion (SqQueries.q144ProjectedTopk)"),
    ],
    "q139_sq_ann": [
        ("BNLJ-nonscalar",
         "broadcast side is the QUANTIZED query-code set (bounded |Q|, "
         "filtered before encoding) against the packed int8 corpus frame "
         "with a non-equi self-exclusion — the compressed-domain scan is "
         "q24's brute-force shape at 1/4 the bytes; only <= rerank rows "
         "per query rejoin the float vectors (SqAnn.scala)"),
    ],
    "q100_nsw_ann": [
        ("BNLJ-nonscalar",
         "beam seed: query set x hub set, BOTH knob-bounded (|Q| queries; "
         "hubs capped at NswAnn.MaxHubs=4096 by the occupancy ladder) — "
         "the walk's entry points, not a data-volume join (NswAnn.scala)"),
    ],
    "q33_ivf_ann": [
        ("BNLJ-nonscalar",
         "broadcast side is the TRAINED-centroid one-row frame "
         "(spark.range(1) projecting k<=nCentroids=8 struct literals the "
         "KMeansExact training produced — plan constants bounded by the "
         "centroid knob, not data volume; IvfAnn.trainedCentroidRow). Both "
         "the assign and probe joins share it"),
    ],
    "q37_fx_carry_forward": [
        ("BNLJ-nonscalar",
         "broadcast side is the DISTINCT currency-pair aggregate — bounded "
         "by the currency-code domain (2 codes here), not data volume "
         "(FxRates.scala)"),
    ],
    "q83_anomaly_days": [
        ("SinglePartition->Window",
         "documented: rollingZ runs on a calendar-bounded daily series "
         "(<= a few thousand rows by construction; Stats.scala scaladoc)"),
    ],
    "q85_approx_quantiles": [
        ("SinglePartition->Window",
         "cumulative window over the histogram SKETCH (<= 1000 bucket "
         "rows, bounded by sketch size, not data; Quantiles.scala)"),
    ],
}

# Build-side subtrees made ONLY of these nodes are driver-created literal
# frames (parallelize of a bounded list — quantile targets, prefix offsets):
# bounded by construction, no file scan or exchange can hide under them.
LITERAL_NODES = {
    "Scan ExistingRDD", "LocalTableScan", "Project", "Filter",
    "SerializeFromObject", "BroadcastExchange", "BroadcastQueryStage",
    "ReusedExchange", "AQEShuffleRead", "ColumnarToRow", "InputAdapter",
    "WholeStageCodegen",
}


def parse_sections(text):
    """Split EXPLAINS.md into (query, body) sections."""
    parts = re.split(r"^## (\S+)$", text, flags=re.M)
    out = []
    for i in range(1, len(parts), 2):
        out.append((parts[i], parts[i + 1]))
    return out


# Trailing annotations after the node id are real: InMemoryTableScan
# prints "(1) (columnarIn=false, columnarOut=true)" and query stages print
# "(70), Statistics(sizeInBytes=...)". Dropping those lines used to skew
# the BNLJ child-indent anchor (the r17 q149 false positive: the streamed
# InMemoryTableScan vanished, its InMemoryRelation became the anchor, and
# the genuine scalar BroadcastExchange sat at a "wrong" indent). The
# leading-prefix check below still restricts matches to tree-drawing lines.
NODE_RE = re.compile(
    r"([A-Za-z][A-Za-z0-9_ ]*?)\s*\((\d+)\)(?:,?\s+[A-Za-z(].*)?\s*$")


def tree_lines(body):
    """Yield (indent, node_name, node_id) for plan-tree lines."""
    for line in body.splitlines():
        m = NODE_RE.search(line)
        if not m:
            continue
        # tree lines are drawn with ':' '+' '-' ' ' prefixes; detail
        # headers start with '(' and reuse the same "(N) Name" shape
        prefix = line[: m.start(1)]
        if prefix.strip(" :+-*") != "":
            continue
        name = m.group(1).strip().lstrip("* ").strip()
        yield len(prefix), name, m.group(2), line


def detail_args(body):
    """node id -> set of Arguments lines from the detail blocks."""
    args = {}
    cur = None
    for line in body.splitlines():
        m = re.match(r"^\((\d+)\) ([A-Za-z][A-Za-z0-9_]*)", line)
        if m:
            cur = m.group(1)
            args.setdefault(cur, {"name": m.group(2), "lines": []})
            continue
        if cur and line.strip():
            args[cur]["lines"].append(line.strip())
        elif not line.strip():
            cur = None
    return args


def single_partition_ids(details):
    ids = set()
    for nid, d in details.items():
        if d["name"] != "Exchange":
            continue
        if any(l.startswith("Arguments: SinglePartition") for l in d["lines"]):
            ids.add(nid)
    return ids


# nodes that pass one row through unchanged between the exchange and the
# aggregate that proves scalar-ness
PASSTHROUGH = {
    "Project", "Filter", "ColumnarToRow", "InputAdapter",
    "WholeStageCodegen", "AQEShuffleRead", "ShuffleQueryStage",
    "ResultQueryStage", "BroadcastQueryStage", "ReusedExchange",
}


def _direct_children(lines, idx):
    """Indices of the direct children of the node at lines[idx] (the lines
    at the first deeper indent level within its subtree)."""
    base = lines[idx][0]
    child_indent = None
    out = []
    for j in range(idx + 1, len(lines)):
        if lines[j][0] <= base:
            break
        if child_indent is None:
            child_indent = lines[j][0]
        if lines[j][0] == child_indent:
            out.append(j)
    return out


def _scalar_node(lines, idx, details):
    """True if the node at lines[idx] provably produces ONE row: a global
    (Keys: []) HashAggregate, a passthrough/broadcast wrapper over one, or
    a BNLJ cross of scalar sides (two 1-row frames crossed stay 1 row).
    A Keys:[] aggregate buried under a join against a fact table does NOT
    qualify — the walk only ever descends through provably-1-row shapes."""
    indent, name, nid, _ = lines[idx]
    if any(name == n or name.startswith(n) for n in PASSTHROUGH) or \
            "BroadcastExchange" in name or "BroadcastQueryStage" in name:
        kids = _direct_children(lines, idx)
        return len(kids) == 1 and _scalar_node(lines, kids[0], details)
    if "HashAggregate" in name:
        d = details.get(nid)
        return bool(d and any(re.match(r"Keys(?: \[\d+\])?: \[\]", l)
                              for l in d["lines"]))
    if name.startswith("BroadcastNestedLoopJoin"):
        kids = _direct_children(lines, idx)
        return len(kids) >= 2 and \
            all(_scalar_node(lines, k, details) for k in kids)
    return False


def scalar_agg_under(lines, start_idx, details):
    """True if the broadcast side rooted at lines[start_idx] is provably
    one row (see [_scalar_node])."""
    return _scalar_node(lines, start_idx, details)


def bounded_range(details, nid, cap=65536):
    """A Range node whose literal row count is <= cap — driver-generated
    plan constants (e.g. spark.range(1) carrying broadcast literals), not
    data. An unbounded/big Range on a broadcast side stays a finding."""
    d = details.get(nid)
    if not d:
        return False
    for l in d["lines"]:
        m = re.search(r"Range \((-?\d+), (-?\d+)", l)
        if m:
            return int(m.group(2)) - int(m.group(1)) <= cap
    return False


def literal_subtree(lines, start_idx, details=None):
    """True if every node under lines[start_idx] is a driver-literal node
    (see LITERAL_NODES, plus row-count-bounded Range) — a bounded
    parallelize()d frame, not data."""
    base_indent = lines[start_idx][0]
    saw_any = False
    for indent, name, nid, _ in lines[start_idx + 1:]:
        if indent <= base_indent:
            break
        saw_any = True
        if any(name == n or name.startswith(n) for n in LITERAL_NODES):
            continue
        if name.startswith("Range") and details is not None and \
                bounded_range(details, nid):
            continue
        return False
    return saw_any


def lint_section(query, body):
    findings = []
    lines = list(tree_lines(body))
    details = detail_args(body)
    sp_ids = single_partition_ids(details)

    for i, (indent, name, nid, raw) in enumerate(lines):
        if name == "Exchange" and nid in sp_ids:
            # direct parent: nearest preceding line with smaller indent
            parent = None
            for j in range(i - 1, -1, -1):
                if lines[j][0] < indent:
                    parent = lines[j][1]
                    break
            if parent and ("Window" in parent or parent == "Sort"):
                findings.append(("SinglePartition->Window",
                                 f"Exchange SinglePartition ({nid}) feeds {parent}"))
        if name == "CartesianProduct":
            findings.append(("CartesianProduct", f"node ({nid})"))
        if name.startswith("BroadcastNestedLoopJoin"):
            # build side = a BroadcastExchange that is a DIRECT child of the
            # BNLJ (scanning the whole subtree would also hit broadcasts on
            # the streamed side and whitelist an unbounded join)
            ok = False
            base = indent
            child_indent = None
            for j in range(i + 1, len(lines)):
                if lines[j][0] <= base:
                    break
                if child_indent is None:
                    child_indent = lines[j][0]
                if lines[j][0] != child_indent:
                    continue
                if "BroadcastExchange" in lines[j][1] or \
                        "BroadcastQueryStage" in lines[j][1]:
                    if scalar_agg_under(lines, j, details) or \
                            literal_subtree(lines, j, details):
                        ok = True
            if not ok:
                findings.append(("BNLJ-nonscalar",
                                 f"BroadcastNestedLoopJoin ({nid}) without a "
                                 "scalar (Keys: []) broadcast side"))
    return findings


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "EXPLAINS.md"
    text = open(path).read()
    bad = 0
    allowed = 0
    for query, body in parse_sections(text):
        for kind, msg in set(lint_section(query, body)):
            reasons = [r for k, r in ALLOW.get(query, []) if k == kind]
            if reasons:
                allowed += 1
                print(f"ALLOWED {query}: {kind} — {reasons[0]}")
            else:
                bad += 1
                print(f"FAIL    {query}: {kind} — {msg}")
    print(f"\n{bad} findings, {allowed} allowed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
