"""Padded HBM-traffic analysis of a compiled XLA module.

``compiled.cost_analysis()['bytes accessed']`` counts LOGICAL bytes: it does
not model the TPU's tiled memory layouts, where the minor-most dimension is
padded to the 128-lane register width and the second-minor to the 8-sublane
height (bf16 packs 2 sublanes per f32 row -> pads to 16; int8 to 32). A
NHWC activation with C=16 therefore occupies — and streams — 8x its logical
bytes. The round-2 roofline used logical bytes and concluded the production
config is MXU-bound at 23% of speed-of-light, while docs/PERF.md argued the
opposite (HBM/lane-padding-bound): this module settles it from the program
itself (round-2 VERDICT weak-1 / next-round task 1).

The analyzer parses the optimized HLO text of a compiled executable (which
prints every buffer's shape WITH its chosen layout+tiling, e.g.
``bf16[128,272,480,16]{3,2,1,0:T(8,128)(2,1)}``), and for every instruction
in the ENTRY computation sums the padded bytes of its output and operands
(operand shapes resolved through a name->shape map — the printer lists
operands by name only). Fused-computation bodies never touch HBM, so only
ENTRY instructions count; aliasing/no-traffic opcodes (parameter, constant,
tuple, get-tuple-element, bitcast) are skipped as producers, while their
buffers are still charged to the real consumers that read them.

Limitations: programs with ``while``/``conditional`` bodies execute
non-ENTRY computations whose traffic is not multiplied out here (the
inference graphs this is built for are straight-line); double-buffering /
rematerialization decisions inside the compiler are invisible. It is a
layout-true estimate, not a profile — but unlike ``cost_analysis`` it
cannot be fooled by lane padding.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

# one shape-with-layout token, e.g. bf16[1,270,480,128]{3,2,1,0:T(8,128)(2,1)}
_SHAPE_RE = re.compile(
    r"\b(" + "|".join(_DTYPE_BYTES) + r")"
    r"\[([\d,]*)\]"
    r"(?:\{([^{}]*)\})?")

# "%name = <shape...> opcode(" — opcode is the lowercase word right before
# the operand paren; shapes/tiles contain no spaces so the last space-
# separated token before '(' is the opcode
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")

_NO_TRAFFIC = {
    "parameter", "constant", "tuple", "get-tuple-element", "bitcast",
    "after-all", "add-dependency", "opt-barrier", "partition-id",
    "replica-id",
}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def padded_shape_bytes(dtype: str, dims: List[int],
                       layout: Optional[str]) -> int:
    """Physical (tiled) size of one buffer in bytes.

    ``layout`` is the text inside ``{}``: minor-to-major dim order,
    optionally ``:T(8,128)`` style tiling groups. The first tile group
    applies to the trailing (minor-most) physical dims; a following
    packing group like ``(2,1)`` (bf16) or ``(4,1)`` (int8) multiplies
    the sublane rounding.
    """
    item = _DTYPE_BYTES[dtype]
    if not dims:
        return item
    n_logical = 1
    for d in dims:
        n_logical *= d
    if n_logical == 0 or not layout:
        return n_logical * item

    order_part, _, tile_part = layout.partition(":")
    try:
        order = [int(t) for t in order_part.split(",") if t.strip() != ""]
    except ValueError:
        return n_logical * item
    tiles = re.findall(r"\(([^()]*)\)", tile_part) if tile_part else []
    if not tiles or len(order) != len(dims):
        return n_logical * item

    phys = [dims[i] for i in order[::-1]]    # major-to-minor
    tile0 = tiles[0].split(",")
    pack = 1
    if len(tiles) > 1:
        try:
            pack = int(tiles[1].split(",")[0])
        except ValueError:
            pack = 1
    # tile dims apply to the len(tile0) minor-most dims (rightmost aligns
    # with minor-most)
    for i, tdim in enumerate(reversed(tile0)):
        axis = len(phys) - 1 - i
        if axis < 0:
            break
        try:
            t = int(tdim)
        except ValueError:
            continue
        if i == 1:                 # sublane axis: packing multiplies it
            t *= pack
        phys[axis] = _round_up(phys[axis], max(t, 1))
    n_pad = 1
    for d in phys:
        n_pad *= d
    return n_pad * item


def _parse_shape(text: str) -> Optional[Tuple[str, List[int],
                                              Optional[str]]]:
    m = _SHAPE_RE.match(text)
    if not m:
        return None
    dtype, dims_s, layout = m.group(1), m.group(2), m.group(3)
    dims = [int(d) for d in dims_s.split(",") if d] if dims_s else []
    return dtype, dims, layout


def _entry_lines(hlo: str) -> List[str]:
    lines = hlo.splitlines()
    out = []
    in_entry = False
    depth = 0
    for line in lines:
        s = line.strip()
        if not in_entry:
            if s.startswith("ENTRY"):
                in_entry = True
                depth = s.count("{") - s.count("}")
            continue
        depth += s.count("{") - s.count("}")
        if depth < 0:
            break
        out.append(s)
    return out


def analyze_hlo_text(hlo: str, top_k: int = 30) -> Dict:
    """Aggregate padded HBM traffic of the ENTRY computation.

    Returns {total_bytes, total_bytes_logical, pad_factor, by_opcode, top}.
    ``top`` rows carry the op_name metadata (the jax source op) so the
    table reads as a per-stage attribution.
    """
    entry = _entry_lines(hlo)

    def split_rhs(rhs: str):
        """-> (output shapes, remainder after the shape part) or None.

        The output is either one shape token or a parenthesized tuple of
        shape tokens (multi-output fusions)."""
        if rhs.startswith("("):
            depth = 0
            for i, ch in enumerate(rhs):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        shapes = [(m.group(1),
                                   [int(d) for d in m.group(2).split(",")
                                    if d] if m.group(2) else [],
                                   m.group(3))
                                  for m in _SHAPE_RE.finditer(rhs[:i])]
                        return shapes, rhs[i + 1:]
            return None
        shape = _parse_shape(rhs)
        if shape is None:
            return None
        m = _SHAPE_RE.match(rhs)
        return [shape], rhs[m.end():]

    defs: Dict[str, list] = {}
    for line in entry:
        m = _DEF_RE.match(line)
        if not m:
            continue
        sp = split_rhs(m.group(2))
        if sp and sp[0]:
            defs[m.group(1)] = sp[0]

    def buf_bytes(shapes) -> Tuple[int, int]:
        tl = tp = 0
        for dtype, dims, layout in shapes:
            n = 1
            for d in dims:
                n *= d
            tl += n * _DTYPE_BYTES[dtype]
            tp += padded_shape_bytes(dtype, dims, layout)
        return tl, tp

    rows = []
    by_opcode: Dict[str, Dict[str, float]] = {}
    total_l = total_p = 0
    for line in entry:
        m = _DEF_RE.match(line)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2)
        sp = split_rhs(rhs)
        if sp is None:
            continue
        out_shapes, rest = sp
        om = re.match(r"\s*([a-z][a-z0-9\-]*)\(", rest)
        if not om:
            continue
        opcode = om.group(1)
        if opcode in _NO_TRAFFIC:
            continue
        logical, padded = buf_bytes(out_shapes)
        # operand names: inside the first paren group (operands are printed
        # name-only; attributes like calls=%x come after the close paren)
        paren = rest[om.end() - 1:]
        depth = 0
        for i, ch in enumerate(paren):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    paren = paren[:i]
                    break
        for op_name_tok in re.findall(r"%([\w.\-]+)", paren):
            shapes = defs.get(op_name_tok)
            if shapes is not None:
                l, p = buf_bytes(shapes)
                logical += l
                padded += p
        if not padded:
            continue
        total_l += logical
        total_p += padded
        meta = re.search(r'op_name="([^"]*)"', line)
        agg = by_opcode.setdefault(opcode, {"bytes": 0, "logical": 0,
                                            "count": 0})
        agg["bytes"] += padded
        agg["logical"] += logical
        agg["count"] += 1
        rows.append({"name": name[:60], "opcode": opcode,
                     "bytes": padded, "logical": logical,
                     "op": (meta.group(1)[-80:] if meta else "")})

    rows.sort(key=lambda r: -r["bytes"])
    for r in rows:
        r["pad_factor"] = round(r["bytes"] / max(r["logical"], 1), 2)
    return {
        "total_bytes": total_p,
        "total_bytes_logical": total_l,
        "pad_factor": round(total_p / max(total_l, 1), 3),
        "by_opcode": dict(sorted(by_opcode.items(),
                                 key=lambda kv: -kv[1]["bytes"])),
        "top": rows[:top_k],
    }


def analyze_compiled(compiled, top_k: int = 30) -> Optional[Dict]:
    """Analyze a ``jax`` compiled executable (``.lower(...).compile()``)."""
    try:
        hlo = compiled.as_text()
    except Exception:
        return None
    if not hlo:
        return None
    return analyze_hlo_text(hlo, top_k=top_k)


# ---------------------------------------------------------------------------
# MXU utilization model (round-4 VERDICT task 2: "what utilization IS
# achievable" for the shipped program, so sol_fraction has an honest
# denominator).
#
# The v5e MXU is a 128x128 systolic array. XLA lowers a conv to implicit
# GEMM passes whose contraction feeds the 128 K lanes and whose output
# features fill the 128 N columns; a conv with C_in=C_out=64 can therefore
# use at most (64/128)*(64/128) = 25% of peak no matter how well it is
# scheduled — the hardware multiplies zero-padding. The *effective* MXU
# bound of a program is sum(flops_i / (peak * eff_i)) over its conv/dot
# instructions, with eff_i = (K_tile/128)*(N_tile/128) (dims >=128 are
# tiled and count as full; M rounds to the 8-sublane grid, a negligible
# factor at these shapes).
# ---------------------------------------------------------------------------

_MXU_DIM = 128
_CONV_RE = re.compile(r"\bconvolution\(")
_DOT_RE = re.compile(r"\bdot\(")
_DIM_LABELS_RE = re.compile(r"dim_labels=(\S+?)(?:,|$|\s)")
_WINDOW_SIZE_RE = re.compile(r"window=\{[^}]*size=([\dx]+)")


def _dim_eff(d: int) -> float:
    """Fraction of the 128-wide MXU axis a dimension of size d can fill
    (tiled: the last partial tile is averaged in)."""
    if d <= 0:
        return 1.0
    full, rem = divmod(d, _MXU_DIM)
    tiles = full + (1 if rem else 0)
    return d / (tiles * _MXU_DIM)


def _computation_blocks(hlo: str) -> List[List[str]]:
    """Split an HLO module's text into computations (ENTRY and fused/
    called bodies alike): each block is the list of its body lines.
    Computations open at column 0 (``%name (...) -> ... {`` or
    ``ENTRY ...{``) and close at the matching brace."""
    blocks: List[List[str]] = []
    cur: Optional[List[str]] = None
    depth = 0
    for line in hlo.splitlines():
        if cur is None:
            s = line.strip()
            if (line[:1] in ("%", "E") and "{" in line
                    and (s.startswith("ENTRY") or s.startswith("%"))):
                depth = line.count("{") - line.count("}")
                if depth > 0:
                    cur = []
            continue
        depth += line.count("{") - line.count("}")
        if depth <= 0:
            blocks.append(cur)
            cur = None
            continue
        cur.append(line.strip())
    if cur:
        blocks.append(cur)
    return blocks


def analyze_mxu(hlo: str, peak_flops: float = 197e12,
                top_k: int = 20) -> Dict:
    """Per-conv/dot M/N/K attribution + achievable-utilization estimate.

    Walks EVERY computation of the optimized HLO (on TPU, convolutions
    live inside fusion bodies, not ENTRY; each fusion body is called from
    exactly one fusion instruction in a straight-line inference graph).
    For convs, dims come from the kernel operand's shape via
    ``dim_labels`` (e.g. ``b01f_01io->b01f``: kernel [kh,kw,Cin,Cout]);
    M is the output's batch*spatial product. flops = 2*M*K*N
    (K = kh*kw*Cin).

    Returns {ops, total_flops, ideal_ms, effective_ms, utilization,
    unattributed_custom_calls}: ``ideal_ms`` assumes every pass fills the
    MXU; ``effective_ms`` divides each op's flops by peak * eff where
    eff = k_eff * n_eff models the zero-padding the 128x128 array
    multiplies for thin contractions/feature dims. Pallas custom-calls'
    flops are invisible to HLO and are counted by name only.

    Limitation: bodies of ``while``/``conditional`` computations are
    counted once, not per iteration (the inference graphs this serves are
    straight-line).
    """
    ops = []
    custom_calls: Dict[str, int] = {}
    pending = []     # (name, line, rhs, out_dims, operand shapes)
    for block in _computation_blocks(hlo):
        # per-block defs: %param_N names repeat across fusion bodies, so
        # operand shapes must resolve within the owning computation
        defs: Dict[str, list] = {}
        for line in block:
            m = _DEF_RE.match(line)
            if not m:
                continue
            shapes = [(s.group(1),
                       [int(d) for d in s.group(2).split(",") if d]
                       if s.group(2) else [], s.group(3))
                      for s in _SHAPE_RE.finditer(
                          m.group(2).split("(")[0])]
            if shapes:
                defs[m.group(1)] = shapes
        for line in block:
            m = _DEF_RE.match(line)
            if not m:
                continue
            name, rhs = m.group(1), m.group(2)
            if "custom-call" in rhs:
                tgt = re.search(r'custom_call_target="([^"]+)"', line)
                key = tgt.group(1) if tgt else "?"
                custom_calls[key] = custom_calls.get(key, 0) + 1
                continue
            is_conv = bool(_CONV_RE.search(rhs))
            is_dot = bool(_DOT_RE.search(rhs)) and not is_conv
            if not (is_conv or is_dot):
                continue
            out = _parse_shape(rhs)
            if out is None:
                continue
            _, out_dims, _ = out
            opnames = re.findall(r"%([\w.\-]+)",
                                 rhs.split("(", 1)[1])
            shapes = [defs[o][0] for o in opnames if o in defs][:2]
            if len(shapes) < 2:
                continue
            pending.append((name, line, out_dims, shapes,
                            is_conv))

    for name, line, out_dims, shapes, is_conv in pending:
        if is_conv:
            labels = _DIM_LABELS_RE.search(line)
            if not labels:
                continue
            lhs_l, rhs_l = labels.group(1).split("->")[0].split("_")
            kdims = shapes[1][1]
            if len(kdims) != len(rhs_l):
                continue
            cin = kdims[rhs_l.index("i")]
            cout = kdims[rhs_l.index("o")]
            # XLA:TPU lowers some dot_generals AS convolutions (huge
            # window + symmetric padding + rhs_reversal — a correlation
            # trick where all but one window position reads zeros). The
            # window taps are then an artifact: only the channel
            # contraction does real MACs. Discriminate by the op_name
            # metadata the compiler preserves.
            is_trick_dot = "/dot_general" in line
            taps = 1
            if not is_trick_dot:
                for ch, d in zip(rhs_l, kdims):
                    if ch not in "io":
                        taps *= d
            out_total = 1
            for d in out_dims:
                out_total *= d
            k = taps * cin
            n = cout
            mrows = out_total // max(1, n)
            # exact for both forms: each output element is k MACs
            flops = 2.0 * out_total * k
            # XLA feeds kh*kw*Cin as one contraction when it can (the
            # patch-GEMM lowering), so K-axis efficiency uses the full
            # k, not per-tap Cin — this is the optimistic (achievable)
            # reading, which is what an honest denominator wants.
            eff = _dim_eff(k) * _dim_eff(n)
            row = {"name": name[:60], "kind": "conv",
                   "M": mrows, "N": n, "K": k,
                   "taps": taps, "cin": cin, "cout": cout}
        else:
            # dot: contraction dims come from the attribute; fall back to
            # "last lhs dim is K" (row-major matmuls — the resize path)
            cdim = re.search(r"lhs_contracting_dims=\{([\d,]+)\}", line)
            ldims = shapes[0][1]
            rdims = shapes[1][1]
            if not ldims or not rdims:
                continue
            if cdim:
                cidx = [int(x) for x in cdim.group(1).split(",")]
                k = 1
                for i in cidx:
                    if i < len(ldims):
                        k *= ldims[i]
            else:
                k = ldims[-1]
            n_out = 1
            for d in out_dims:
                n_out *= d
            mrows = max(1, n_out // max(1, rdims[-1]))
            n = rdims[-1]
            flops = 2.0 * mrows * k * n
            eff = _dim_eff(k) * _dim_eff(n)
            row = {"name": name[:60], "kind": "dot",
                   "M": mrows, "N": n, "K": k}
        row["gflops"] = round(flops / 1e9, 2)
        row["eff"] = round(eff, 3)
        row["ideal_ms"] = round(flops / peak_flops * 1e3, 3)
        row["effective_ms"] = round(flops / (peak_flops * max(eff, 1e-6))
                                    * 1e3, 3)
        ops.append(row)

    total_flops = sum(r["gflops"] for r in ops) * 1e9
    ideal_ms = sum(r["ideal_ms"] for r in ops)
    effective_ms = sum(r["effective_ms"] for r in ops)
    ops.sort(key=lambda r: -r["effective_ms"])
    return {
        "ops": ops[:top_k],
        "n_ops": len(ops),
        "total_flops": total_flops,
        "ideal_ms": round(ideal_ms, 3),
        "effective_ms": round(effective_ms, 3),
        "utilization": round(ideal_ms / effective_ms, 3)
        if effective_ms else None,
        "unattributed_custom_calls": custom_calls,
    }
