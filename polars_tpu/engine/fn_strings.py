"""String ops over dictionary-coded columns.

The TPU string strategy (north star): device arrays hold int32 codes; every
string op runs ONCE per unique value on the host at trace time (the dictionary
is static metadata), producing constant LUTs gathered on device. Reference
semantics: polars-ops/src/chunked_array/strings/.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.engine.common import Val, combine_validity
from polars_tpu.engine.registry import BOOL, SAME, register
from polars_tpu.engine.strings import map_over_table
from polars_tpu.errors import InvalidOperationError


def _require_str(v: Val) -> Val:
    if v.table is None:
        raise InvalidOperationError("expected a String column")
    return v


def _lut_op(v: Val, fn, out_dtype: dt.DataType, *, with_validity: bool = False) -> Val:
    """Host fn over uniques -> non-string output via LUT gather."""
    uniques = v.table.values
    n = max(len(uniques), 1)
    if with_validity:
        outs = np.zeros(n, dt.dtype_to_numpy(out_dtype))
        ok = np.ones(n, bool)
        for i, u in enumerate(uniques):
            r = fn(u)
            if r is None:
                ok[i] = False
            else:
                outs[i] = r
        codes = jnp.clip(v.values, 0, n - 1)
        out = jnp.asarray(outs)[codes]
        okv = jnp.asarray(ok)[codes]
        return Val(out, combine_validity(v.validity, okv), out_dtype, None, v.domain)
    outs = np.asarray([fn(u) for u in uniques] or [0], dt.dtype_to_numpy(out_dtype))
    codes = jnp.clip(v.values, 0, n - 1)
    return Val(jnp.asarray(outs)[codes], v.validity, out_dtype, None, v.domain)


def _str_map(v: Val, fn) -> Val:
    """Host fn over uniques -> string output (remapped table)."""
    return map_over_table(v, lambda u: np.asarray([fn(x) for x in u] or [""], object), out_is_string=True)


def _compile_or_null(ctx, v, pat, opts, out_dtype):
    """re.compile honoring ``strict``: an invalid pattern raises when strict
    (reference behavior), else the whole output is null."""
    try:
        return re.compile(pat), None
    except re.error as exc:
        if opts.get("strict", True):
            from polars_tpu.errors import ComputeError

            raise ComputeError(f"invalid regex pattern {pat!r}: {exc}") from None
        n = v.values.shape[0]
        return None, Val(
            jnp.zeros((n,), jnp.dtype(dt.dtype_to_numpy(out_dtype))
                      if not isinstance(out_dtype, dt.Boolean) else bool),
            jnp.zeros((n,), bool), out_dtype, None, v.domain,
        )


@register("str.contains", BOOL)
def _contains(ctx, args, opts):
    v = _require_str(args[0])
    pat, literal = opts["pattern"], opts.get("literal", False)
    if literal:
        return _lut_op(v, lambda s: pat in s, dt.Boolean())
    rx, bail = _compile_or_null(ctx, v, pat, opts, dt.Boolean())
    if bail is not None:
        return bail
    return _lut_op(v, lambda s: rx.search(s) is not None, dt.Boolean())


@register("str.contains_any", BOOL)
def _contains_any(ctx, args, opts):
    v = _require_str(args[0])
    pats = opts["patterns"]
    if opts.get("ascii_case_insensitive"):
        pats = [p.lower() for p in pats]
        return _lut_op(v, lambda s: any(p in s.lower() for p in pats), dt.Boolean())
    return _lut_op(v, lambda s: any(p in s for p in pats), dt.Boolean())


def ac_occurrences(hay, pats, *, overlapping=False, leftmost=False, ascii_ci=False):
    """Aho-Corasick-equivalent literal multi-matching: (start, end, pat_idx)
    tuples in reference order — standard semantics order by match END
    (earliest-end-first), leftmost orders by start then pattern index
    (reference: polars-ops strings find_many/replace_many via aho-corasick)."""
    h = _ascii_lower(hay) if ascii_ci else hay
    occ = []
    for pi, p in enumerate(pats):
        if not p:
            continue
        pp = _ascii_lower(p) if ascii_ci else p
        st = h.find(pp)
        while st >= 0:
            occ.append((st, st + len(pp), pi))
            st = h.find(pp, st + 1)
    if overlapping:
        occ.sort(key=lambda t: (t[1], t[0]))
        return occ
    occ.sort(key=(lambda t: (t[0], t[2])) if leftmost else (lambda t: (t[1], t[0])))
    out, pos = [], 0
    for s, e, pi in occ:
        if s >= pos:
            out.append((s, e, pi))
            pos = e
    return out


_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _ascii_lower(s):
    return s.translate(_ASCII_LOWER)


def group_field_names(pattern: str) -> list[str]:
    """Capture-group field names for str.extract_groups: named groups keep
    their name, unnamed groups get their 1-based position as a string
    (reference: py-polars expr/string.py extract_groups notes)."""
    rx = re.compile(translate_group_syntax(pattern))
    names = {v: k for k, v in rx.groupindex.items()}
    return [names.get(i, str(i)) for i in range(1, rx.groups + 1)]


def translate_group_syntax(pattern: str) -> str:
    """Rust-regex named groups `(?<name>` -> Python `(?P<name>` (lookbehinds
    `(?<=` / `(?<!` untouched)."""
    return re.sub(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", r"(?P<\1>", pattern)


@register("str.replace_many", SAME, elementwise=False)
def _replace_many(ctx, args, opts):
    v = _require_str(args[0])
    pats = list(opts["patterns"])
    reps = list(opts["replace_with"])
    if len(reps) == 1:
        reps = reps * len(pats)
    if len(reps) != len(pats):
        raise InvalidOperationError(
            "replace_with must have the same length as patterns (or length 1)"
        )
    ci = bool(opts.get("ascii_case_insensitive", False))
    leftmost = bool(opts.get("leftmost", False))

    def f(s):
        occ = ac_occurrences(s, pats, leftmost=leftmost, ascii_ci=ci)
        out, pos = [], 0
        for st, en, pi in occ:
            out.append(s[pos:st])
            out.append(reps[pi])
            pos = en
        out.append(s[pos:])
        return "".join(out)

    return _str_map(v, f)


@register("str.escape_regex", SAME, elementwise=False)
def _escape_regex(ctx, args, opts):
    return _str_map(_require_str(args[0]), re.escape)


@register("str.normalize", SAME, elementwise=False)
def _normalize(ctx, args, opts):
    import unicodedata

    form = opts.get("form", "NFC")
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise InvalidOperationError(f"invalid normalization form {form!r}")
    return _str_map(_require_str(args[0]), lambda s: unicodedata.normalize(form, s))


def _lut2_op(v: Val, p: Val, fn, out_dtype):
    """Row-wise string predicate with an EXPRESSION rhs: both sides are
    dict-coded, so a host |t1|x|t2| truth matrix + one traced 2-D gather keeps
    the op fused (dictionaries are small by engine invariant)."""
    t1 = v.table.values
    t2 = p.table.values
    m = np.asarray(
        [[fn(a, b) for b in t2] for a in t1] or [[0]],
        dt.dtype_to_numpy(out_dtype),
    )
    if m.size == 0:
        m = np.zeros((max(len(t1), 1), max(len(t2), 1)), dt.dtype_to_numpy(out_dtype))
    lut = jnp.asarray(m)
    i = jnp.clip(v.values, 0, max(len(t1) - 1, 0))
    j = jnp.clip(p.values, 0, max(len(t2) - 1, 0))
    out = lut[i, j]
    validity = combine_validity(v.validity, p.validity)
    return Val(out, validity, dt.parse_into_dtype(out_dtype), None, v.domain)


@register("str.starts_with", BOOL)
def _starts_with(ctx, args, opts):
    v = _require_str(args[0])
    if len(args) > 1:
        return _lut2_op(v, _require_str(args[1]), lambda a, b: a.startswith(b), dt.Boolean())
    p = opts["prefix"]
    return _lut_op(v, lambda s: s.startswith(p), dt.Boolean())


@register("str.ends_with", BOOL)
def _ends_with(ctx, args, opts):
    v = _require_str(args[0])
    if len(args) > 1:
        return _lut2_op(v, _require_str(args[1]), lambda a, b: a.endswith(b), dt.Boolean())
    p = opts["suffix"]
    return _lut_op(v, lambda s: s.endswith(p), dt.Boolean())


@register("str.len_chars", dt.UInt32())
def _len_chars(ctx, args, opts):
    return _lut_op(_require_str(args[0]), lambda s: len(s), dt.UInt32())


@register("str.len_bytes", dt.UInt32())
def _len_bytes(ctx, args, opts):
    return _lut_op(_require_str(args[0]), lambda s: len(s.encode()), dt.UInt32())


@register("str.count_matches", dt.UInt32())
def _count_matches(ctx, args, opts):
    v = _require_str(args[0])
    pat, literal = opts["pattern"], opts.get("literal", False)
    if literal:
        return _lut_op(v, lambda s: s.count(pat), dt.UInt32())
    rx = re.compile(pat)
    return _lut_op(v, lambda s: len(rx.findall(s)), dt.UInt32())


@register("str.find", dt.UInt32())
def _find(ctx, args, opts):
    v = _require_str(args[0])
    pat, literal = opts["pattern"], opts.get("literal", False)
    if literal:
        return _lut_op(v, lambda s: (s.find(pat) if s.find(pat) >= 0 else None), dt.UInt32(), with_validity=True)
    rx, bail = _compile_or_null(ctx, v, pat, opts, dt.UInt32())
    if bail is not None:
        return bail

    def f(s):
        m = rx.search(s)
        return m.start() if m else None

    return _lut_op(v, f, dt.UInt32(), with_validity=True)


for _name, _f in [
    ("to_lowercase", lambda s, o: s.lower()),
    ("to_uppercase", lambda s, o: s.upper()),
    ("to_titlecase", lambda s, o: s.title()),
    ("reverse", lambda s, o: s[::-1]),
    ("strip_chars", lambda s, o: s.strip(o.get("characters"))),
    ("strip_chars_start", lambda s, o: s.lstrip(o.get("characters"))),
    ("strip_chars_end", lambda s, o: s.rstrip(o.get("characters"))),
    ("strip_prefix", lambda s, o: s[len(o["prefix"]):] if s.startswith(o["prefix"]) else s),
    ("strip_suffix", lambda s, o: s[: -len(o["suffix"])] if s.endswith(o["suffix"]) else s),
    ("pad_start", lambda s, o: s.rjust(o["length"], o.get("fill_char", " "))),
    ("pad_end", lambda s, o: s.ljust(o["length"], o.get("fill_char", " "))),
    ("zfill", lambda s, o: s.zfill(o["length"])),
]:
    def _mk(name, f):
        @register(f"str.{name}", dt.String())
        def _(ctx, args, opts):
            v = _require_str(args[0])
            return _str_map(v, lambda s: f(s, opts))

    _mk(_name, _f)


@register("str.slice", dt.String())
def _slice(ctx, args, opts):
    v = _require_str(args[0])
    off, length = opts.get("offset", 0), opts.get("length")

    def f(s):
        if length is None:
            return s[off:]
        if off < 0:
            end = off + length
            return s[off : end if end < 0 else None]
        return s[off : off + length]

    return _str_map(v, f)


@register("str.tail", dt.String())
def _tail(ctx, args, opts):
    v = _require_str(args[0])
    n = opts["n"]
    return _str_map(v, lambda s: s[-n:] if n else "")


@register("str.replace", dt.String())
def _replace(ctx, args, opts):
    v = _require_str(args[0])
    pat, val, literal, n = opts["pattern"], opts["value"], opts.get("literal", False), opts.get("n", 1)
    count = 0 if n < 0 else n
    if literal:
        return _str_map(v, lambda s: s.replace(pat, val, -1 if n < 0 else n))
    rx = re.compile(pat)
    repl = re.sub(r"\$(\d+)", r"\\\1", val)  # polars uses $1 group refs
    return _str_map(v, lambda s: rx.sub(repl, s, count=count))


@register("str.extract", dt.String())
def _extract(ctx, args, opts):
    v = _require_str(args[0])
    rx = re.compile(opts["pattern"])
    gi = opts.get("group_index", 1)
    uniques = v.table.values
    n = max(len(uniques), 1)
    outs = np.empty(n, object)
    ok = np.ones(n, bool)
    for i, u in enumerate(uniques):
        m = rx.search(u)
        if m is None or (gi > 0 and m.group(gi) is None):
            ok[i] = False
            outs[i] = ""
        else:
            outs[i] = m.group(gi)
    mapped = map_over_table(v, lambda u: outs[: len(u)] if len(u) else np.asarray([""], object), out_is_string=True)
    codes = jnp.clip(v.values, 0, n - 1)
    okv = jnp.asarray(ok)[codes]
    return mapped.with_(validity=combine_validity(v.validity, okv))


@register("str.to_integer", lambda dts, opts: dt.Int64())
def _to_integer(ctx, args, opts):
    v = _require_str(args[0])
    base = opts.get("base", 10)

    def f(s):
        try:
            return int(str(s).strip(), base)
        except ValueError:
            return None

    out = _lut_op(v, f, dt.Int64(), with_validity=True)
    return _strict_parse_flag(ctx, v, out, opts, "i64")


def _strict_parse_flag(ctx, v, out, opts, what):
    """Strict str->X conversion: an unparsable NON-NULL value raises at the
    count sync (reference: strict casts error instead of nulling)."""
    if opts.get("strict", True) and ctx is not None:
        from polars_tpu.engine.common import ROW as _ROW

        in_ok = jnp.ones(v.values.shape, bool) if v.validity is None else v.validity
        out_ok = jnp.ones(v.values.shape, bool) if out.validity is None else out.validity
        bad = in_ok & ~out_ok
        if v.domain == _ROW:
            bad = bad & ctx.rowmask
        ctx.add_flag(jnp.any(bad), f"conversion from `str` to `{what}` failed")
    return out


_FMT_RX = {
    "%Y": r"\d{4}", "%y": r"\d{2}", "%m": r"\d{1,2}", "%d": r"\d{1,2}",
    "%H": r"\d{1,2}", "%M": r"\d{1,2}", "%S": r"\d{1,2}", "%j": r"\d{1,3}",
    "%f": r"\d+", "%b": r"[A-Za-z]{3}", "%B": r"[A-Za-z]+",
    "%a": r"[A-Za-z]{3}", "%A": r"[A-Za-z]+", "%p": r"[APap][Mm]",
    "%%": r"%",
}


def _fmt_search_regex(fmt: str):
    """chrono-style non-exact parsing: a regex matching the format's shape,
    used to locate the date substring (reference: strptime exact=false
    searches within the string)."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            spec = fmt[i:i + 2]
            out.append(_FMT_RX.get(spec, re.escape(spec[1])))
            i += 2
        else:
            out.append(re.escape(fmt[i]))
            i += 1
    return re.compile("".join(out))


@register("str.to_date", dt.Date())
def _to_date(ctx, args, opts):
    v = _require_str(args[0])
    fmt = opts.get("format")
    exact = opts.get("exact", True)
    srx = None
    if not exact:
        srx = _fmt_search_regex(fmt) if fmt is not None else re.compile(r"\d{4}-\d{2}-\d{2}")

    def f(s):
        try:
            s = str(s)
            if srx is not None:
                m = srx.search(s)
                if m is None:
                    return None
                s = m.group(0)
            if fmt is None:
                d64 = np.datetime64(s, "D")
                if np.isnat(d64):  # "" parses to NaT without raising
                    return None
                return int(d64.astype(np.int64))
            import datetime as _dt

            return (_dt.datetime.strptime(s, fmt).date() - _dt.date(1970, 1, 1)).days
        except (ValueError, TypeError):
            return None

    out = _lut_op(v, f, dt.Date(), with_validity=True)
    return _strict_parse_flag(ctx, v, out, opts, "date")


@register("str.to_datetime", lambda dts, opts: dt.Datetime(opts.get("time_unit", "us")))
def _to_datetime(ctx, args, opts):
    v = _require_str(args[0])
    fmt = opts.get("format")
    tu = opts.get("time_unit", "us")
    mult = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[tu]
    srx = None
    if not opts.get("exact", True):
        srx = _fmt_search_regex(fmt) if fmt is not None else re.compile(
            r"\d{4}-\d{2}-\d{2}[T ]?(\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?"
        )

    def f(s):
        try:
            s = str(s)
            if srx is not None:
                m = srx.search(s)
                if m is None:
                    return None
                s = m.group(0)
            if fmt is None:
                d64 = np.datetime64(s, tu)
                if np.isnat(d64):
                    return None
                return int(d64.astype(np.int64))
            import datetime as _dt

            d = _dt.datetime.strptime(s, fmt).replace(tzinfo=_dt.timezone.utc)
            # exact integer path (float .timestamp() drops the microsecond
            # far from the epoch — see core/column._to_epoch_ts)
            delta = d - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
            return micros * mult // 1_000_000
        except (ValueError, TypeError):
            return None

    out = _lut_op(v, f, dt.Datetime(tu), with_validity=True)
    return _strict_parse_flag(ctx, v, out, opts, "datetime")


@register("str.to_time", dt.Time())
def _to_time(ctx, args, opts):
    v = _require_str(args[0])
    fmt = opts.get("format") or "%H:%M:%S"

    def f(s):
        try:
            import datetime as _dt

            t = _dt.datetime.strptime(str(s), fmt).time()
            return (
                t.hour * 3_600_000_000_000
                + t.minute * 60_000_000_000
                + t.second * 1_000_000_000
                + t.microsecond * 1000
            )
        except (ValueError, TypeError):
            return None

    return _lut_op(v, f, dt.Time(), with_validity=True)


def _json_decode_dt(dts, opts):
    return opts.get("dtype") or dt.Unknown()


register("str.json_decode", _json_decode_dt, elementwise=False)(
    lambda ctx, args, opts: (_ for _ in ()).throw(
        InvalidOperationError("str.json_decode is a host op (routed via special select)")
    )
)


@register("str.json_path_match", dt.String())
def _json_path_match(ctx, args, opts):
    v = _require_str(args[0])
    path = opts["json_path"]
    if not path.startswith("$."):
        raise InvalidOperationError("only simple $.field json paths supported")
    field = path[2:]
    import json

    uniques = v.table.values
    n = max(len(uniques), 1)
    ok = np.ones(n, bool)

    def f(s):
        try:
            obj = json.loads(s)
            val = obj
            for part in field.split("."):
                val = val[part]
            return str(val)
        except Exception:
            return None

    outs = np.empty(n, object)
    for i, u in enumerate(uniques):
        r = f(u)
        if r is None:
            ok[i] = False
            outs[i] = ""
        else:
            outs[i] = r
    mapped = map_over_table(v, lambda u: outs[: len(u)] if len(u) else np.asarray([""], object), out_is_string=True)
    codes = jnp.clip(v.values, 0, n - 1)
    okv = jnp.asarray(ok)[codes]
    return mapped.with_(validity=combine_validity(v.validity, okv))


@register("str.encode", dt.String())
def _encode(ctx, args, opts):
    v = _require_str(args[0])
    enc = opts["encoding"]
    if enc == "base64":
        import base64

        return _str_map(v, lambda s: base64.b64encode(s.encode()).decode())
    if enc == "hex":
        return _str_map(v, lambda s: s.encode().hex())
    raise InvalidOperationError(f"unknown encoding {enc!r}")


@register("str.decode", dt.Binary())
def _decode(ctx, args, opts):
    # reference returns Binary (py-polars expr/string.py decode) — raw bytes,
    # not re-interpreted UTF-8. strict raises on invalid input; non-strict
    # nulls it (reference: chunked_array/strings/decode.rs).
    v = _require_str(args[0])
    enc = opts["encoding"]
    strict = opts.get("strict", True)

    def wrap(f):
        def g(s):
            try:
                return f(s)
            except Exception:
                if strict:
                    from polars_tpu.errors import ComputeError

                    raise ComputeError(
                        f"invalid value while {enc}-decoding {s!r}"
                    ) from None
                return None

        return g

    if enc == "base64":
        import base64

        return _table_transform(
            v, wrap(lambda s: base64.b64decode(s, validate=True)), dt.Binary(),
            with_validity=not strict,
        )
    if enc == "hex":
        return _table_transform(
            v, wrap(bytes.fromhex), dt.Binary(), with_validity=not strict
        )
    raise InvalidOperationError(f"unknown encoding {enc!r}")


def _list_of_strings_lut(v: Val, parts_per_unique: list) -> Val:
    """Traced List(String) from a host per-UNIQUE decomposition.

    The child layout depends only on the dictionary (host-known at trace
    time), never on row data: flat parts in code order become a new parts
    table + int32 child codes; each row's packed (start<<32|len) word is one
    LUT gather on its code. Rows SHARE child ranges (fan-out), which is why
    the TracedChild carries max_list_len — explode sizes by it.
    Reference: polars-ops strings split.rs builds per-value lists; here the
    dictionary makes that an O(uniques) trace-time constant."""
    from polars_tpu.engine.common import TracedChild
    from polars_tpu.utils import strtable

    nu = max(len(parts_per_unique), 1)
    starts = np.zeros(nu, np.int64)
    lens = np.zeros(nu, np.int64)
    flat: list = []
    for i, ps in enumerate(parts_per_unique):
        starts[i] = len(flat)
        lens[i] = len(ps)
        flat.extend(ps)
    codes_np, _val, table = strtable.encode_strings(
        np.asarray(flat if flat else [], object)
    )
    codes = jnp.clip(v.values, 0, nu - 1)
    packed = (jnp.asarray(starts)[codes] << 32) | jnp.asarray(lens)[codes]
    child = TracedChild(
        jnp.asarray(codes_np.astype(np.int32)), None, dt.String(), table,
        jnp.int32(len(flat)), None, None,
        max_list_len=int(lens.max()) if len(parts_per_unique) else 1,
    )
    return Val(packed, v.validity, dt.List(dt.String()), None, v.domain, child)


@register("str.split", lambda dts, opts: dt.List(dt.String()), elementwise=False)
def _split(ctx, args, opts):
    v = _require_str(args[0])
    by = opts.get("by", " ")
    inclusive = bool(opts.get("inclusive", False))

    def one(u: str) -> list:
        ps = u.split(by)
        if inclusive and len(ps) > 1:
            return [p + by for p in ps[:-1]] + [ps[-1]]
        return ps

    return _list_of_strings_lut(v, [one(u) for u in v.table.values])


@register("str.extract_all", lambda dts, opts: dt.List(dt.String()), elementwise=False)
def _extract_all(ctx, args, opts):
    v = _require_str(args[0])
    rx = re.compile(opts.get("pattern", ""))
    return _list_of_strings_lut(
        v, [[m.group(0) for m in rx.finditer(u)] for u in v.table.values]
    )


def _list_of_ints_lut(v: Val, ints_per_unique: list, inner) -> Val:
    """Traced List(int) from a host per-UNIQUE decomposition (the int-child
    sibling of _list_of_strings_lut — find_many offsets etc.)."""
    from polars_tpu.engine.common import TracedChild

    nu = max(len(ints_per_unique), 1)
    starts = np.zeros(nu, np.int64)
    lens = np.zeros(nu, np.int64)
    flat: list = []
    for i, ps in enumerate(ints_per_unique):
        starts[i] = len(flat)
        lens[i] = len(ps)
        flat.extend(int(x) for x in ps)
    vals = np.asarray(flat if flat else [0], dtype=dt.dtype_to_numpy(inner))
    codes = jnp.clip(v.values, 0, nu - 1)
    packed = (jnp.asarray(starts)[codes] << 32) | jnp.asarray(lens)[codes]
    child = TracedChild(
        jnp.asarray(vals), None, inner, None, jnp.int32(len(flat)), None, None,
        max_list_len=int(lens.max()) if len(ints_per_unique) else 1,
    )
    return Val(packed, v.validity, dt.List(inner), None, v.domain, child)


def _many_occ(opts, values):
    pats = list(opts.get("patterns", ()))
    ci = bool(opts.get("ascii_case_insensitive", False))
    overlapping = bool(opts.get("overlapping", False))
    leftmost = bool(opts.get("leftmost", False))
    return [
        ac_occurrences(u, pats, overlapping=overlapping, leftmost=leftmost, ascii_ci=ci)
        for u in values
    ]


@register("str.extract_many", lambda dts, opts: dt.List(dt.String()), elementwise=False)
def _extract_many(ctx, args, opts):
    # literal-pattern path: Aho-Corasick over the DICTIONARY (host, trace
    # time), child from the per-unique matches — one LUT gather per row.
    # Per-row pattern columns keep the host path (executors gate).
    v = _require_str(args[0])
    occs = _many_occ(opts, v.table.values)
    return _list_of_strings_lut(
        v, [[u[s:en] for s, en, _ in occ] for u, occ in zip(v.table.values, occs)]
    )


@register("str.find_many", lambda dts, opts: dt.List(dt.UInt32()), elementwise=False)
def _find_many(ctx, args, opts):
    v = _require_str(args[0])
    occs = _many_occ(opts, v.table.values)
    # utf8 BYTE offsets, like the reference's find_many
    return _list_of_ints_lut(
        v,
        [[len(u[:s].encode()) for s, _en, _ in occ]
         for u, occ in zip(v.table.values, occs)],
        dt.UInt32(),
    )


@register(
    "str.extract_groups",
    lambda dts, opts: dt.Struct(
        [(n, dt.String()) for n in group_field_names(opts.get("pattern", ""))]
    ),
    elementwise=False,
)
def _extract_groups(ctx, args, opts):
    raise InvalidOperationError("str.extract_groups is a host op (routed via special select)")


@register(
    "str.split_exact",
    lambda dts, opts: dt.Struct(
        [(f"field_{i}", dt.String()) for i in range(int(opts.get("n", 0)) + 1)]
    ),
    elementwise=False,
)
def _split_exact(ctx, args, opts):
    raise InvalidOperationError("str.split_exact is a host op (routed via special select)")


@register(
    "str.splitn",
    lambda dts, opts: dt.Struct(
        [(f"field_{i}", dt.String()) for i in range(int(opts.get("n", 1)))]
    ),
    elementwise=False,
)
def _splitn(ctx, args, opts):
    raise InvalidOperationError("str.splitn is a host op (routed via special select)")


@register("cat.get_categories", dt.String(), elementwise=False)
def _get_categories(ctx, args, opts):
    raise InvalidOperationError("cat.get_categories is materialized by the executor")

# -- binary namespace (reference: polars-ops chunked_array/binary) -------------


def _as_bytes(u):
    return u if isinstance(u, (bytes, bytearray)) else str(u).encode()


@register("bin.contains", BOOL)
def _bin_contains(ctx, args, opts):
    v = _require_str(args[0])
    lit = _as_bytes(opts["literal"])
    return _lut_op(v, lambda s: lit in _as_bytes(s), dt.Boolean())


@register("bin.starts_with", BOOL)
def _bin_starts_with(ctx, args, opts):
    v = _require_str(args[0])
    lit = _as_bytes(opts["prefix"])
    return _lut_op(v, lambda s: _as_bytes(s).startswith(lit), dt.Boolean())


@register("bin.ends_with", BOOL)
def _bin_ends_with(ctx, args, opts):
    v = _require_str(args[0])
    lit = _as_bytes(opts["suffix"])
    return _lut_op(v, lambda s: _as_bytes(s).endswith(lit), dt.Boolean())


@register("bin.size", dt.UInt32())
def _bin_size(ctx, args, opts):
    v = _require_str(args[0])
    return _lut_op(v, lambda s: len(_as_bytes(s)), dt.UInt32())


def _table_transform(v: Val, fn, out_dtype, *, with_validity=False):
    """Host transform over table uniques -> NEW dictionary column. With
    ``with_validity``, a None result from ``fn`` nulls the row."""
    from polars_tpu.utils import strtable

    uniques = [fn(u) for u in v.table.values]
    codes_np, uval, table = strtable.encode_strings(np.asarray(uniques, object))
    lut = jnp.asarray(codes_np if len(codes_np) else np.zeros(1, np.int32))
    clipped = jnp.clip(v.values, 0, max(len(uniques) - 1, 0))
    out = lut[clipped]
    validity = v.validity
    if with_validity and uval is not None:
        okv = jnp.asarray(uval)[clipped]
        validity = okv if validity is None else (validity & okv)
    return Val(out, validity, out_dtype, table, v.domain)


@register("bin.slice", SAME, elementwise=False)
def _bin_slice(ctx, args, opts):
    v = _require_str(args[0])
    off = int(opts.get("offset", 0))
    length = opts.get("length")

    def f(s):
        b = _as_bytes(s)
        if length is None:
            return b[off:]
        if off < 0:
            end = off + int(length)
            return b[off : end if end < 0 else None]
        return b[off : off + int(length)]

    return _table_transform(v, f, dt.Binary())


@register("bin.get", dt.UInt8())
def _bin_get(ctx, args, opts):
    v = _require_str(args[0])
    idx = int(opts.get("index", 0))

    def f(s):
        b = _as_bytes(s)
        i = idx if idx >= 0 else len(b) + idx
        return b[i] if 0 <= i < len(b) else None

    return _lut_op(v, f, dt.UInt8(), with_validity=True)


@register("bin.reinterpret", lambda dts, opts: dt.parse_into_dtype(opts["dtype"]))
def _bin_reinterpret(ctx, args, opts):
    """Fixed-width bytes -> numeric (reference: polars-ops binary cast.rs
    reinterpret); wrong-size payloads become null."""
    import struct as _struct

    v = _require_str(args[0])
    out_dt = dt.parse_into_dtype(opts["dtype"])
    endian = "<" if opts.get("endianness", "little") == "little" else ">"
    code = {
        "Int8": "b", "UInt8": "B", "Int16": "h", "UInt16": "H",
        "Int32": "i", "UInt32": "I", "Int64": "q", "UInt64": "Q",
        "Float32": "f", "Float64": "d",
    }.get(type(out_dt).__name__)
    if code is None:
        raise InvalidOperationError(f"cannot reinterpret binary as {out_dt!r}")
    size = _struct.calcsize(code)

    def f(s):
        b = _as_bytes(s)
        if len(b) != size:
            return None
        return _struct.unpack(endian + code, b)[0]

    return _lut_op(v, f, out_dt, with_validity=True)


@register("bin.encode", lambda dts, opts: dt.String())
def _bin_encode(ctx, args, opts):
    import base64
    import binascii

    v = _require_str(args[0])
    enc = opts["encoding"]
    if enc == "hex":
        fn = lambda s: binascii.hexlify(_as_bytes(s)).decode()  # noqa: E731
    elif enc == "base64":
        fn = lambda s: base64.b64encode(_as_bytes(s)).decode()  # noqa: E731
    else:
        raise InvalidOperationError(f"unknown encoding {enc!r}")
    return _table_transform(v, fn, dt.String())


@register("bin.decode", lambda dts, opts: dt.Binary())
def _bin_decode(ctx, args, opts):
    import base64
    import binascii

    v = _require_str(args[0])
    enc = opts["encoding"]
    strict = opts.get("strict", True)
    if enc == "hex":
        base_fn = lambda s: binascii.unhexlify(str(s))  # noqa: E731
    elif enc == "base64":
        base_fn = lambda s: base64.b64decode(str(s), validate=True)  # noqa: E731
    else:
        raise InvalidOperationError(f"unknown encoding {enc!r}")

    def fn(s):
        try:
            return base_fn(s)
        except Exception:
            if strict:
                from polars_tpu.errors import ComputeError

                raise ComputeError(
                    f"invalid value while {enc}-decoding {s!r}"
                ) from None
            return None

    return _table_transform(v, fn, dt.Binary(), with_validity=not strict)

