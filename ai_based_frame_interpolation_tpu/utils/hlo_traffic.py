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
