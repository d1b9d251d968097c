"""Minimal pure-python parser for XLA profiler xplane.pb traces.

The image's tensorboard_plugin_profile can't parse xplanes (its pywrap
bridge is built against a different TF), so this decodes the protobuf
wire format directly — XSpace > XPlane > XLine > XEvent plus the two
metadata maps — and aggregates device-side op time.

Proto schema (tsl/profiler/protobuf/xplane.proto):
  XSpace { repeated XPlane planes = 1; }
  XPlane { int64 id=1; string name=2; repeated XLine lines=3;
           map<int64,XEventMetadata> event_metadata=4;
           map<int64,XStatMetadata> stat_metadata=5; repeated XStat stats=6; }
  XLine  { int64 id=1; string name=2; int64 timestamp_ns=3;
           repeated XEvent events=4; int64 duration_ps=9; }
  XEvent { int64 metadata_id=1; int64 offset_ps=2; int64 duration_ps=3;
           repeated XStat stats=4; }
  XEventMetadata { int64 id=1; string name=2; bytes metadata=3;
                   string display_name=4; repeated XStat stats=5; }
  XStatMetadata  { int64 id=1; string name=2; }
  XStat  { int64 metadata_id=1; double double_value=2; uint64 uint64=3;
           int64 int64=4; string str=5; bytes bytes=6; uint64 ref=7; }

Usage: python scripts/xplane_parse.py <trace_dir_or_xplane.pb> [--top 30]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import struct
import sys
from collections import defaultdict


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer.
    Length-delimited values are memoryviews; varints are ints."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wire == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _parse_event(buf: memoryview) -> tuple[int, int]:
    meta_id = dur_ps = 0
    for field, _, val in _fields(buf):
        if field == 1:
            meta_id = val
        elif field == 3:
            dur_ps = val
    return meta_id, dur_ps


def _parse_line(buf: memoryview) -> dict:
    line = {"name": "", "events": []}
    for field, _, val in _fields(buf):
        if field == 2:
            line["name"] = bytes(val).decode("utf-8", "replace")
        elif field == 4:
            line["events"].append(_parse_event(val))
    return line


def _parse_event_metadata(buf: memoryview) -> tuple[int, str, str]:
    mid, name, disp = 0, "", ""
    for field, _, val in _fields(buf):
        if field == 1:
            mid = val
        elif field == 2:
            name = bytes(val).decode("utf-8", "replace")
        elif field == 4:
            disp = bytes(val).decode("utf-8", "replace")
    return mid, name, disp


def _parse_meta_entry(buf: memoryview) -> tuple[int, str, str]:
    """map<int64, XEventMetadata> entry: key=1 varint, value=2 message."""
    key = 0
    name = disp = ""
    for field, _, val in _fields(buf):
        if field == 1:
            key = val
        elif field == 2:
            mid, name, disp = _parse_event_metadata(val)
            if mid:
                key = key or mid
    return key, name, disp


def _parse_plane(buf: memoryview) -> dict:
    plane = {"name": "", "lines": [], "event_meta": {}}
    for field, _, val in _fields(buf):
        if field == 2:
            plane["name"] = bytes(val).decode("utf-8", "replace")
        elif field == 3:
            plane["lines"].append(_parse_line(val))
        elif field == 4:
            key, name, disp = _parse_meta_entry(val)
            plane["event_meta"][key] = (name, disp)
    return plane


def parse_xspace(path: str) -> list[dict]:
    with open(path, "rb") as f:
        data = memoryview(f.read())
    planes = []
    for field, _, val in _fields(data):
        if field == 1:
            planes.append(_parse_plane(val))
    return planes


def aggregate(trace_dir: str, top: int = 30) -> dict:
    """Sum per-op device time over the 'XLA Ops' lines of TPU planes.
    Returns {device_total_s, busy fractions, top ops}."""
    if os.path.isdir(trace_dir):
        pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
        if not pbs:
            raise FileNotFoundError(f"no .xplane.pb under {trace_dir}")
        path = pbs[0]
    else:
        path = trace_dir
    planes = parse_xspace(path)
    device_planes = [
        p for p in planes
        if "TPU" in p["name"] or p["name"].startswith("/device:")
    ]
    if not device_planes:
        names = [p["name"] for p in planes]
        raise RuntimeError(f"no device plane found; planes: {names}")

    # r5 fix: aggregate ONLY the TensorCore "XLA Ops" line.  "Async XLA
    # Ops" events (DMA copies) OVERLAP the compute line — summing both
    # double-counted data movement against wall time and produced the
    # bogus r4 "69% async-copy" readout.  Async totals are reported
    # separately as overlap context.
    by_op: dict[str, float] = defaultdict(float)
    by_cat: dict[str, float] = defaultdict(float)
    async_by_op: dict[str, float] = defaultdict(float)
    total_ps = 0
    async_ps = 0
    for plane in device_planes:
        meta = plane["event_meta"]
        for line in plane["lines"]:
            if line["name"] == "Async XLA Ops":
                for meta_id, dur_ps in line["events"]:
                    name, disp = meta.get(meta_id, (f"op_{meta_id}", ""))
                    async_by_op[disp or name] += dur_ps
                    async_ps += dur_ps
                continue
            if line["name"] != "XLA Ops":
                continue
            for meta_id, dur_ps in line["events"]:
                name, disp = meta.get(meta_id, (f"op_{meta_id}", ""))
                label = disp or name
                by_op[label] += dur_ps
                by_cat[_category(label)] += dur_ps
                total_ps += dur_ps

    total_s = total_ps / 1e12
    ops = sorted(by_op.items(), key=lambda kv: -kv[1])
    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    return {
        "xplane": path,
        "device_op_time_s": round(total_s, 4),
        "async_overlapped_s": round(async_ps / 1e12, 4),
        "async_ops": {
            k[:60]: round(v / 1e12, 4)
            for k, v in sorted(async_by_op.items(), key=lambda kv: -kv[1])[:5]
        },
        "categories": {
            k: {"s": round(v / 1e12, 4), "pct": round(100 * v / total_ps, 1)}
            for k, v in cats
        },
        "top_ops": [
            {
                "op": k[:120],
                "s": round(v / 1e12, 5),
                "pct": round(100 * v / total_ps, 2),
            }
            for k, v in ops[:top]
        ],
    }


def attribute_modules(trace: str, hlo_path: str, top: int = 15) -> dict:
    """Join TC-line op durations with optimized-HLO metadata op_name paths
    to attribute device time per model module (r5: this is how the
    'MRD = 72% of TC time' number is produced)."""
    import re

    opmod: dict[str, str] = {}
    pat = re.compile(r"%(\S+?) = .*metadata=\{op_name=\"([^\"]*)\"")
    with open(hlo_path) as fh:
        for line in fh:
            m = pat.search(line)
            if m:
                opmod[m.group(1)] = m.group(2)

    def module_of(p: str) -> str:
        if "MultiResolutionDiscriminator" in p:
            return "mrd"
        if "SLMFeatureExtractor" in p or "/slm" in p:
            return "slm"
        for k in ("speech_predictor", "SpeechPredictor", "TextEncoder",
                  "Decoder", "Generator", "Flow", "Posterior", "Prior"):
            if k in p:
                return "speech_predictor"
        if "MelStyleEncoder" in p:
            return "mel_style_encoder"
        if "PitchEnergyPredictor" in p:
            return "pitch_energy"
        return "other"

    if os.path.isdir(trace):
        pbs = glob.glob(f"{trace}/**/*.xplane.pb", recursive=True)
        trace = pbs[0]
    planes = parse_xspace(trace)
    agg: dict[str, float] = defaultdict(float)
    tot = 0
    for plane in planes:
        if "TPU" not in plane["name"] and not plane["name"].startswith("/device:"):
            continue
        meta = plane["event_meta"]
        for line in plane["lines"]:
            if line["name"] != "XLA Ops":
                continue
            for mid, dur in line["events"]:
                name, disp = meta.get(mid, ("", ""))
                key = (disp or name).lstrip("%")
                path = opmod.get(key) or opmod.get(key.split(".")[0], "")
                agg[module_of(path)] += dur
                tot += dur
    return {
        "tc_time_s": round(tot / 1e12, 4),
        "by_module": {
            k: {"s": round(v / 1e12, 4), "pct": round(100 * v / tot, 1)}
            for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:top]
        },
    }


def _category(op: str) -> str:
    o = op.lower()
    if "conv" in o:
        return "convolution"
    if o.startswith(("dot", "gemm")) or "dot" in o.split(".")[0]:
        return "matmul"
    if "fusion" in o:
        return "fusion"
    if "all-reduce" in o or "all-gather" in o or "collective" in o:
        return "collective"
    if "copy" in o or "transpose" in o or "bitcast" in o:
        return "data-movement"
    if "rng" in o:
        return "rng"
    if "reduce" in o:
        return "reduce"
    if "scatter" in o or "gather" in o or "dynamic" in o:
        return "gather-scatter"
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("trace", help="trace dir or xplane.pb path")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--hlo", default=None,
                    help="optimized-HLO dump (scripts/hlo_copies.py --out) "
                         "to attribute TC time per model module")
    args = ap.parse_args()
    out = aggregate(args.trace, args.top)
    if args.hlo:
        out["modules"] = attribute_modules(args.trace, args.hlo)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
