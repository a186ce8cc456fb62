"""Fusion-aware HBM-byte accounting over the FINAL compiled HLO (VERDICT r4 #6).

`compiled.cost_analysis()['bytes accessed']` (tools/roofline.py) is XLA's cost
model and overshoots physics on this pipeline (341.9 GB at 356 ms implies
~960 GB/s "effective" against the v5e's 819 GB/s ceiling): it charges operand
bytes for instructions whose producers are FUSED and never re-touch HBM. This
tool instead walks the optimized post-fusion HLO text, where fusion is explicit:

  - only TOP-LEVEL instructions of the entry computation (and of while
    bodies/conditions, multiplied by their parsed trip counts) touch HBM;
  - each counted instruction reads each operand buffer once (a buffer feeding N
    consumers IS re-read N times on TPU — each kernel pulls its own inputs) and
    writes its output once;
  - aliasing/no-cost ops (get-tuple-element, tuple, bitcast, parameter,
    constant) contribute nothing; their consumers account the bytes.

This is the "byte-accounting pass over the final HLO with fusion-aware dedup"
the round-4 verdict asked for. It is still a static model (no DMA counters are
exposed on this platform), but one whose assumptions match the hardware's
kernel-level reality, so effective GB/s derived from it must land UNDER the HBM
peak — a physical sanity check cost_analysis failed.

Usage:
    python tools/hlo_bytes.py [--view-num 5] [--dtype bfloat16]
        [--act-quant int8s] [--warp-quant int8] [--measured-s 0.35]
        [--platform cpu]   # parser smoke test at small shape
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_HBM_BPS = 819e9  # TPU v5e public HBM bandwidth

_DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2,
    "f16": 2, "bf16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
    "f64": 8, "c64": 8, "c128": 16, "f8e4m3fn": 1, "f8e5m2": 1,
}

# one array shape like bf16[1,128,120,224,8]{4,3,2,1,0:T(8,128)(2,1)} or f32[]
_SHAPE_RE = re.compile(r"\b([a-z]\w*)\[([\d,]*)\]")
# an instruction definition: "%name = <shape(s)> opcode(...)" (ROOT optional)
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?[a-z][^=]*?\)?)\s+([a-z][\w\-]*)\("
)


def shape_bytes(shape_txt: str) -> int:
    """Total bytes of every array in a shape string (handles tuples)."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_txt):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_NO_COST = {
    "get-tuple-element", "tuple", "bitcast", "parameter", "constant",
    "after-all", "partition-id", "replica-id", "iota",
}


def parse_computations(hlo: str):
    """{comp_name: [(instr_name, shape_txt, opcode, [operand names])]} plus the
    entry computation name, while (body, cond, caller_comp) triples, and the set
    of computations called as fusions."""
    comps: dict[str, list] = {}
    entry = None
    fusion_called: set[str] = set()
    whiles = []  # (body, condition, comp_the_while_lives_in)
    calls: dict[str, list] = {}          # comp -> called (to_apply) comps
    conditionals: dict[str, list] = {}   # comp -> [branch comp name lists]
    int_consts: dict[str, list] = {}     # comp -> integer constant values
    cur = None
    for line in hlo.splitlines():
        # strip /*...*/ comments FIRST: long tuple shapes carry /*index=N*/
        # markers whose '=' breaks the [^=] shape group in _INSTR_RE, which
        # silently dropped every instruction with a >=6-element tuple shape —
        # including the pair-scan while loops themselves
        line = re.sub(r"/\*.*?\*/", "", line)
        stripped = line.strip()
        # computation headers: "%name (args...) -> result {" — args may contain
        # nested parens (tuple-typed parameters), so don't try to balance them
        header = re.match(r"^(ENTRY\s+)?%?([\w.\-]+)\s*\(.*->.*\{\s*$", stripped)
        if header and not stripped.startswith("//"):
            cur = header.group(2)
            comps[cur] = []
            if header.group(1):
                entry = cur
            continue
        if stripped.startswith("}"):
            cur = None
            continue
        if cur is None:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_txt, opcode = m.group(1), m.group(2).strip(), m.group(3)
        # operand names: %tokens inside the first (...) after the opcode
        rest = line[m.end():]
        depth = 1
        args = []
        buf = ""
        for ch in rest:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    args.append(buf)
                    break
            if depth >= 1 and ch == "," and depth == 1:
                args.append(buf)
                buf = ""
            else:
                buf += ch
        operands = []
        for a in args:
            am = re.match(r"\s*%?([\w.\-]+)", a)
            # HLO operand tokens may carry inline shapes ("f32[8]{0} %foo");
            # grab the LAST %token in the fragment
            toks = re.findall(r"%([\w.\-]+)", a)
            if toks:
                operands.append(toks[-1])
            elif am and not re.match(r"\s*[a-z]\w*\[", a):
                operands.append(am.group(1))
        comps[cur].append((name, shape_txt, opcode, operands))
        if opcode == "constant":
            cv = re.search(r"constant\((-?\d+)\)", line)
            if cv and re.match(r"[su]\d+\[\]", shape_txt):
                int_consts.setdefault(cur, []).append(int(cv.group(1)))
        for cm in re.finditer(r"calls=%?([\w.\-]+)", line):
            fusion_called.add(cm.group(1))
        wb = re.search(r"body=%?([\w.\-]+)", line)
        wc = re.search(r"condition=%?([\w.\-]+)", line)
        if opcode == "while" and wb and wc:
            whiles.append((wb.group(1), wc.group(1), cur))
        if opcode in ("call", "async-start"):
            ta = re.search(r"to_apply=%?([\w.\-]+)", line)
            if ta:
                calls.setdefault(cur, []).append(ta.group(1))
        if opcode == "conditional":
            br = re.search(r"branch_computations=\{([^}]*)\}", line)
            names = (re.findall(r"%?([\w.\-]+)", br.group(1)) if br else
                     [m.group(1) for m in re.finditer(
                         r"(?:true|false)_computation=%?([\w.\-]+)", line)])
            if names:
                conditionals.setdefault(cur, []).append(names)
    return comps, entry, whiles, fusion_called, calls, conditionals, int_consts


def account(hlo: str):
    (comps, entry, whiles, fusion_called, calls, conditionals,
     int_consts) = parse_computations(hlo)
    if entry is None:
        raise ValueError("no ENTRY computation found")

    # while trip counts: canonical counted loops compare the induction variable
    # with a scalar integer constant in the CONDITION computation; take the max
    # such constant (the bound). The loop bound may also have been folded into
    # the BODY (iv + 1 vs constant moved) or the while init — fall back to 1 and
    # surface the value so a reader can spot an unparsed loop.
    trip: dict[str, int] = {}
    for body, cond, _caller in whiles:
        consts = [c for c in int_consts.get(cond, []) if c > 0]
        trip[body] = max(consts) if consts else 1
        trip[cond] = trip[body]

    def comp_bytes(comp: str, depth=0):
        """(read_bytes, write_bytes) of one execution of `comp`'s top level."""
        if comp not in comps:
            return 0, 0
        shapes = {name: shape_bytes(sh) for name, sh, _o, _ops in comps[comp]}
        rd = wr = 0
        for name, sh, opcode, operands in comps[comp]:
            if opcode in _NO_COST:
                continue
            if opcode == "while":
                # the loop-carried state is threaded (aliased) through the body;
                # its traffic is charged inside the body x trip count below
                continue
            wr += shapes[name]
            rd += sum(shapes.get(op, 0) for op in operands)
        # whiles in this computation: body+cond bytes x trip count
        for body, cond, caller in whiles:
            if caller != comp:
                continue
            n = trip.get(body, 1)
            brd, bwr = comp_bytes(body, depth + 1)
            crd, cwr = comp_bytes(cond, depth + 1)
            rd += n * (brd + crd)
            wr += n * (bwr + cwr)
        # plain calls: once each; conditionals: charge the heaviest branch
        for callee in calls.get(comp, []):
            crd, cwr = comp_bytes(callee, depth + 1)
            rd += crd
            wr += cwr
        for branch_names in conditionals.get(comp, []):
            best = max((comp_bytes(b, depth + 1) for b in branch_names
                        if b in comps), default=(0, 0), key=sum)
            rd += best[0]
            wr += best[1]
        return rd, wr

    rd, wr = comp_bytes(entry)
    return {
        "read_bytes": rd, "write_bytes": wr, "total_bytes": rd + wr,
        "while_trip_counts": {b: trip.get(b) for b, _c, _x in whiles},
        "n_computations": len(comps),
        "n_fusion_bodies": len(fusion_called),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--view-num", type=int, default=5)
    ap.add_argument("--max-d", type=int, default=128)
    ap.add_argument("--max-h", type=int, default=480)
    ap.add_argument("--max-w", type=int, default=896)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--act-quant", default="int8s")
    ap.add_argument("--warp-quant", default="int8")
    ap.add_argument("--measured-s", type=float, default=None,
                    help="measured steady-state seconds/forward (bench.py)")
    ap.add_argument("--platform", default=None, help="e.g. cpu for a parser check")
    ap.add_argument("--hlo-file", default=None, help="account a dumped HLO instead")
    args = ap.parse_args()

    if args.hlo_file:
        with open(args.hlo_file) as f:
            hlo = f.read()
    else:
        if args.platform:
            import jax

            jax.config.update("jax_platforms", args.platform)
        from atvsnet_tpu.utils.runtime import setup_jax

        setup_jax()
        import jax
        import jax.numpy as jnp

        from atvsnet_tpu.config import PipelineConfig
        from atvsnet_tpu.data.synthetic import synthetic_scene
        from atvsnet_tpu.models.atvsnet import multi_view_forward
        from atvsnet_tpu.models.tvsnet import init_params

        cfg = PipelineConfig(
            view_num=args.view_num, max_d=args.max_d, max_h=args.max_h,
            max_w=args.max_w, compute_dtype=args.dtype,
            act_quant=args.act_quant, warp_quant=args.warp_quant,
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        images, cams = synthetic_scene(
            view_num=args.view_num, H=args.max_h, W=args.max_w, D=args.max_d, seed=0)
        fwd = jax.jit(lambda p, i, c: jnp.sum(
            multi_view_forward(p, i, c, cfg)["depth_up"].astype(jnp.float32)))
        hlo = fwd.lower(params, jnp.asarray(images), jnp.asarray(cams)).compile().as_text()

    # NOTE: keep everything above the `hlo =` lowering line byte-identical when
    # editing this file — the persistent compile cache keys on source locations
    # of the traced lambda (see .claude/skills/verify), and a cache miss at the
    # flagship bucket costs minutes.
    dump = os.environ.get("ATVSNET_DUMP_HLO")
    if dump:
        with open(dump, "w") as f:
            f.write(hlo)

    r = account(hlo)
    out = {
        "metric": "hbm_bytes_per_forward_fusion_aware",
        "total_GB": round(r["total_bytes"] / 1e9, 2),
        "read_GB": round(r["read_bytes"] / 1e9, 2),
        "write_GB": round(r["write_bytes"] / 1e9, 2),
        "while_trip_counts": r["while_trip_counts"],
        # raw count of while instructions in the HLO text: must equal
        # len(while_trip_counts) or the parser missed a loop (the lax.scan over
        # pairs may also be fully unrolled by XLA, leaving zero whiles)
        "n_while_instrs": hlo.count(" while("),
        "n_computations": r["n_computations"],
        "n_fusion_bodies": r["n_fusion_bodies"],
        "bandwidth_floor_s": round(r["total_bytes"] / PEAK_HBM_BPS, 4),
    }
    if args.measured_s:
        out["measured_s"] = args.measured_s
        out["effective_GBps"] = round(r["total_bytes"] / 1e9 / args.measured_s, 1)
        out["pct_of_hbm_peak"] = round(100 * out["effective_GBps"] / (PEAK_HBM_BPS / 1e9), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
