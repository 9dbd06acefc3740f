"""Static per-instruction profiler from optimized HLO (a "paper profiler").

The reference relies on nvprof/torch-profiler culture; on TPU the real tool
is `jax.profiler`, but some environments (like this dev box, where the TPU
sits behind a tunnel) cannot serve a trace.  This module gives the next
best thing with zero device support: parse the *optimized* executable HLO
of a jitted function and produce a per-instruction roofline estimate

    t_est = max(flops / peak_flops, hbm_bytes / hbm_bw)

with each instruction attributed to the JAX scope stack that produced it
(`metadata op_name`, e.g. "jit(step)/transpose(jvp(OccDepthModel))/
net_rgb/encoder/...") — so forward vs backward and model stage are
separable.  Estimates are not measurements: they bound compute/HBM-traffic
per op and rank hot spots; layout-copy stalls and ICI are not modeled.

Usage:
    rows = hlo_breakdown(fn, *args)            # list of InstrCost
    print_breakdown(rows, top=30)              # ranked table
    print_breakdown(rows, top=20, group="scope")  # grouped by scope prefix
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

# v5e per-chip peaks (bf16 MXU; HBM).  Estimates scale linearly if you
# override for another generation.
PEAK_FLOPS = 197e12
HBM_BW = 819e9

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?[\w\[\],\s{}:#*()]+?\)?)\s+"
    r"([\w\-]+)\(")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')
_WINDOW_RE = re.compile(r"window={size=([\dx]+)")
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")


def _shape_bytes(type_str: str) -> int:
    """Total bytes of a (possibly tuple) HLO type string."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _arg_list(rest: str) -> str:
    """The top-level (...) argument list of an instruction line."""
    depth, start = 0, rest.find("(")
    if start < 0:
        return ""
    for i in range(start, len(rest)):
        if rest[i] == "(":
            depth += 1
        elif rest[i] == ")":
            depth -= 1
            if depth == 0:
                return rest[start + 1:i]
    return rest[start + 1:]


_OPERAND_RE = re.compile(r"%?([\w.\-]+)")


def _operand_types(rest: str, symtab: Dict[str, str]) -> List[str]:
    """Operand type strings, resolved via inline types or the symbol table."""
    args_str = _arg_list(rest)
    out = []
    for piece in args_str.split(","):
        piece = piece.strip()
        if not piece:
            continue
        if _SHAPE_RE.search(piece):  # inline-typed operand
            out.append(piece)
            continue
        m = _OPERAND_RE.match(piece)
        if m and m.group(1) in symtab:
            out.append(symtab[m.group(1)])
    return out


def _dims_of(type_str: str) -> List[int]:
    m = _SHAPE_RE.search(type_str)
    if not m:
        return []
    return [int(d) for d in m.group(2).split(",") if d]


def _conv_flops(out_type: str, rest: str, op_types: Sequence[str]) -> int:
    """FLOPs of a convolution: 2 * out_elems * Cin_per_group * prod(window)."""
    m = _WINDOW_RE.search(rest)
    window = int(np.prod([int(x) for x in m.group(1).split("x")])) if m else 1
    out_dims = _dims_of(out_type)
    if not out_dims:
        return 0
    out_elems = int(np.prod(out_dims))
    # input feature dim position comes from dim_labels, e.g. b01f_01io->b01f
    cin = 1
    dl = re.search(r"dim_labels=([\w?]+)_", rest)
    in_dims = _dims_of(op_types[0]) if op_types else []
    if dl and in_dims:
        fpos = dl.group(1).find("f")
        if 0 <= fpos < len(in_dims):
            cin = in_dims[fpos]
    elif in_dims:
        cin = in_dims[-1]
    gm = re.search(r"feature_group_count=(\d+)", rest)
    g = int(gm.group(1)) if gm else 1
    return 2 * out_elems * max(cin // g, 1) * window


def _dot_flops(out_type: str, rest: str, op_types: Sequence[str]) -> int:
    """FLOPs of a dot: 2 * out_elems * prod(contracted dims)."""
    out_dims = _dims_of(out_type)
    if not out_dims:
        return 0
    out_elems = int(np.prod(out_dims))
    cm = re.search(r"lhs_contracting_dims={([\d,]+)}", rest)
    lhs_dims = _dims_of(op_types[0]) if op_types else []
    k = 1
    if cm and lhs_dims:
        for ci in cm.group(1).split(","):
            i = int(ci)
            if i < len(lhs_dims):
                k *= lhs_dims[i]
    return 2 * out_elems * k


@dataclasses.dataclass
class InstrCost:
    name: str
    op: str
    out_type: str
    bytes: int  # operand + output HBM bytes (upper bound: assumes no reuse)
    flops: int
    t_us: float  # roofline max(compute, memory) in microseconds
    scope: str  # op_name metadata ("" if absent)


def hlo_breakdown(fn, *args, fused_flops: bool = True,
                  **kwargs) -> List[InstrCost]:
    """Compile fn (cached if seen before) and rank optimized-HLO costs."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    text = compiled.as_text()
    return analyze_hlo_text(text, fused_flops=fused_flops)


def analyze_hlo_text(text: str, fused_flops: bool = True) -> List[InstrCost]:
    lines = text.splitlines()

    # Pass 1: symbol table name -> output type, across ALL computations
    # (operand types are usually not inline in modern HLO text).
    symtab: Dict[str, str] = {}
    for line in lines:
        im = _INSTR_RE.match(line)
        if im:
            symtab[im.group(1)] = im.group(2)

    # Pass 2: per-computation totals.  comp_flops charges conv/dot FLOPs
    # of fused computations to the fusion instruction that calls them;
    # comp_cost sums a computation's full (bytes, flops) so call-like ops
    # in ENTRY (while/conditional/call — e.g. a lax.scan'd train step) can
    # be charged their body's per-iteration cost instead of being
    # silently zero-costed.  One level of nesting (a while inside a while
    # body is not expanded).
    comp_flops: Dict[str, int] = {}
    comp_instrs: Dict[str, List[Tuple[str, str, str]]] = {}
    comp: Optional[str] = None
    for line in lines:
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->", line)
        if m and "=" not in line.split("->")[0]:
            comp = m.group(1)
            continue
        im = _INSTR_RE.match(line)
        if not (im and comp):
            continue
        op = im.group(3)
        rest = line[im.end() - 1:]
        comp_instrs.setdefault(comp, []).append((op, im.group(2), rest))
        if op in ("convolution", "dot"):
            ots = _operand_types(rest, symtab)
            f = (_conv_flops(im.group(2), rest, ots) if op == "convolution"
                 else _dot_flops(im.group(2), rest, ots))
            comp_flops[comp] = comp_flops.get(comp, 0) + f

    def _comp_cost(name: str) -> Tuple[int, int]:
        b = f = 0
        for op, out_type, rest in comp_instrs.get(name, []):
            if op in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
                continue
            ots = _operand_types(rest, symtab)
            b += _shape_bytes(out_type) + sum(_shape_bytes(t) for t in ots)
            if op == "convolution":
                f += _conv_flops(out_type, rest, ots)
            elif op == "dot":
                f += _dot_flops(out_type, rest, ots)
            elif op == "fusion":
                cm = _CALLS_RE.search(rest)
                if cm:
                    f += comp_flops.get(cm.group(1), 0)
        return b, f

    rows: List[InstrCost] = []
    in_entry = False
    for line in lines:
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        im = _INSTR_RE.match(line)
        if not im:
            continue
        name, out_type, op = im.group(1), im.group(2), im.group(3)
        if op in ("parameter", "constant", "tuple", "get-tuple-element",
                  "bitcast"):
            continue
        rest = line[im.end() - 1:]
        ots = _operand_types(rest, symtab)
        b = _shape_bytes(out_type) + sum(_shape_bytes(t) for t in ots)
        flops = 0
        om = _OPNAME_RE.search(line)
        scope = om.group(1) if om else ""
        if op == "convolution":
            flops = _conv_flops(out_type, rest, ots)
        elif op == "dot":
            flops = _dot_flops(out_type, rest, ots)
        elif op == "fusion" and fused_flops:
            cm = _CALLS_RE.search(rest)
            if cm:
                flops = comp_flops.get(cm.group(1), 0)
        elif op in ("while", "conditional", "call"):
            # charge ONE iteration / branch of every called computation;
            # trip counts are not static — flag it in the scope
            called: List[str] = []
            for key in ("body", "condition", "to_apply",
                        "true_computation", "false_computation"):
                m2 = re.search(rf"{key}=%?([\w.\-]+)", rest)
                if m2:
                    called.append(m2.group(1))
            m2 = re.search(r"branch_computations=\{([^}]*)\}", rest)
            if m2:
                called += re.findall(r"%?([\w.\-]+)", m2.group(1))
            for cname in called:
                cb, cf = _comp_cost(cname)
                b += cb
                flops += cf
            scope = (scope + " [per-iteration cost; trip count unknown]"
                     ).strip()
        t = max(flops / PEAK_FLOPS, b / HBM_BW) * 1e6
        rows.append(InstrCost(name, op, out_type.strip(), b, flops, t, scope))
    rows.sort(key=lambda r: -r.t_us)
    return rows


def group_by_scope(rows: Sequence[InstrCost], depth: int = 3
                   ) -> List[Tuple[str, float, int, int]]:
    """Aggregate roofline time by the first `depth` op_name scope levels."""
    agg: Dict[str, List[float]] = {}
    for r in rows:
        key = "/".join(r.scope.split("/")[:depth]) if r.scope else "<no-op_name>"
        a = agg.setdefault(key, [0.0, 0, 0])
        a[0] += r.t_us
        a[1] += r.bytes
        a[2] += r.flops
    out = [(k, v[0], v[1], v[2]) for k, v in agg.items()]
    out.sort(key=lambda x: -x[1])
    return out


def _dominant_dtype(type_str: str) -> str:
    """Dtype of the byte-dominant element of a (possibly tuple) HLO type.
    Multi-output fusions like `(f32[16], bf16[1,256,256,32,16])` are
    attributed to the big element's dtype, not the first one's — charging
    a 67 MB bf16 conv fusion to its tiny f32 stat output would corrupt
    the dtype-in-flight audit."""
    best, best_bytes = "?", -1
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = _DTYPE_BYTES[dt]
        for d in dims.split(","):
            if d:
                n *= int(d)
        if n > best_bytes:
            best, best_bytes = dt, n
    return best


def group_by_dtype(rows: Sequence[InstrCost]
                   ) -> List[Tuple[str, float, int, int]]:
    """Aggregate roofline cost by the output's byte-DOMINANT dtype — the
    dtype-in-flight audit (which share of HBM traffic moves fp32 that
    could be bf16)."""
    agg: Dict[str, List[float]] = {}
    for r in rows:
        key = _dominant_dtype(r.out_type)
        a = agg.setdefault(key, [0.0, 0, 0])
        a[0] += r.t_us
        a[1] += r.bytes
        a[2] += r.flops
    out = [(k, v[0], v[1], v[2]) for k, v in agg.items()]
    out.sort(key=lambda x: -x[1])
    return out


def roofline_summary(rows: Sequence[InstrCost], measured_s: float) -> Dict:
    """Derived physics for a measured device time: HBM utilization and MFU
    against the static optimized-HLO roofline.  The byte count assumes no
    on-chip reuse, so hbm_util is an upper bound (can exceed 1; ~1 reads
    as 'at the HBM roofline')."""
    traffic = sum(r.bytes for r in rows)
    flops = sum(r.flops for r in rows)
    return {
        "hlo_traffic_gb": round(traffic / 1e9, 1),
        "hlo_flops_tflop": round(flops / 1e12, 2),
        "hbm_util": round(traffic / HBM_BW / measured_s, 3),
        "mfu": round(flops / PEAK_FLOPS / measured_s, 4),
    }


def print_breakdown(rows: Sequence[InstrCost], top: int = 30,
                    group: Optional[str] = None, depth: int = 3) -> None:
    total = sum(r.t_us for r in rows)
    tb = sum(r.bytes for r in rows)
    tf = sum(r.flops for r in rows)
    print(f"instructions: {len(rows)}  est total {total/1e3:.2f} ms  "
          f"(traffic {tb/1e9:.2f} GB -> {tb/HBM_BW*1e3:.2f} ms; "
          f"flops {tf/1e12:.2f} T -> {tf/PEAK_FLOPS*1e3:.2f} ms)")
    if group == "scope":
        for key, t, b, f in group_by_scope(rows, depth)[:top]:
            print(f"{t/1e3:8.3f} ms  {b/1e6:9.1f} MB  {f/1e9:9.1f} GF  {key}")
        return
    if group == "dtype":
        for key, t, b, f in group_by_dtype(rows)[:top]:
            print(f"{t/1e3:8.3f} ms  {b/1e6:9.1f} MB  {f/1e9:9.1f} GF  {key}")
        return
    for r in rows[:top]:
        scope = r.scope[-80:]
        print(f"{r.t_us/1e3:8.3f} ms  {r.op:12s} {r.bytes/1e6:9.1f} MB  "
              f"{r.flops/1e9:9.1f} GF  {scope}")
