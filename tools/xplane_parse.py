"""Minimal self-contained .xplane.pb reader (protobuf wire format).

`jax.profiler.trace` emits XSpace protos, but the only shipped parsers
(tensorboard_plugin_profile / tensorflow's _pywrap_profiler) are broken
in this image (stale generated protos + a missing pywrap symbol). The
XSpace schema is small and stable, so this decodes the wire format
directly — no tensorflow dependency:

    XSpace{planes=1} → XPlane{name=2, lines=3, event_metadata=4(map)}
      → XLine{name=2, events=4} → XEvent{metadata_id=1, duration_ps=3}
      with XEventMetadata{id=1, name=2, display_name=4}.
    (Field numbers verified against traces this image's jax emits.)

`op_totals` aggregates event durations by op (event-metadata name) over
a plane/line selection — enough for the "where does device time go"
question tools/profile_program.py answers.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Iterator, List, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) for one message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:                       # varint
            v, i = _varint(buf, i)
        elif wt == 1:                     # 64-bit
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:                     # length-delimited
            ln, i = _varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:                     # 32-bit
            v, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt} at byte {i}")
        yield fn, wt, v


def _map_entry(buf: bytes) -> Tuple[int, bytes]:
    """Decode a map<int64, Message> entry → (key, value_bytes)."""
    key, val = 0, b""
    for fn, _, v in fields(buf):
        if fn == 1:
            key = v
        elif fn == 2:
            val = v
    return key, val


def parse_planes(xspace: bytes) -> List[Dict]:
    """XSpace bytes → [{name, lines: [{name, events: [(meta_id, dur_ps)]}],
    event_names: {meta_id: name}}]."""
    planes = []
    for fn, _, plane in fields(xspace):
        if fn != 1:
            continue
        name, lines, event_names = "", [], {}
        for pf, _, pv in fields(plane):
            if pf == 2:
                name = pv.decode("utf-8", "replace")
            elif pf == 3:                 # XLine
                lname, events = "", []
                for lf, lwt, lv in fields(pv):
                    if lf == 2 and lwt == 2:
                        lname = lv.decode("utf-8", "replace")
                    elif lf == 4 and lwt == 2:  # XEvent
                        mid = dur = 0
                        for ef, _, ev in fields(lv):
                            if ef == 1:
                                mid = ev
                            elif ef == 3:
                                dur = ev
                        events.append((mid, dur))
                lines.append({"name": lname, "events": events})
            elif pf == 4:                 # event_metadata map
                mid, meta = _map_entry(pv)
                mname = disp = ""
                for mf, _, mv in fields(meta):
                    if mf == 2:
                        mname = mv.decode("utf-8", "replace")
                    elif mf == 4:
                        disp = mv.decode("utf-8", "replace")
                event_names[mid] = disp or mname
        planes.append({"name": name, "lines": lines,
                       "event_names": event_names})
    return planes


def op_totals(xplane_paths: List[str], plane_filter: str = "TPU",
              line_filter: str = "") -> List[Dict]:
    """Aggregate event durations by op name across trace files.

    Returns rows sorted by total time: {op, occurrences, total_ms}.
    `plane_filter`/`line_filter` are substring matches on plane/line
    names ("" matches everything).
    """
    total_ps: Dict[str, int] = defaultdict(int)
    count: Dict[str, int] = defaultdict(int)
    for path in xplane_paths:
        with open(path, "rb") as f:
            for plane in parse_planes(f.read()):
                if plane_filter and plane_filter not in plane["name"]:
                    continue
                names = plane["event_names"]
                for line in plane["lines"]:
                    if line_filter and line_filter not in line["name"]:
                        continue
                    for mid, dur in line["events"]:
                        op = names.get(mid, f"op#{mid}")
                        total_ps[op] += dur
                        count[op] += 1
    rows = [{"op": op, "occurrences": count[op],
             "total_ms": total_ps[op] / 1e9}
            for op in total_ps]
    rows.sort(key=lambda r: -r["total_ms"])
    return rows
