#!/usr/bin/env python
"""Independent minimal OSM PBF decoder (stdlib only) used as ground truth
for the Scala DataSource's unit tests. Prints element counts, id sums, and
spot-check rows. Format per the public OSM PBF spec (wiki.openstreetmap.org
/wiki/PBF_Format)."""
import sys, zlib, struct

def varints(buf, pos, end):
    while pos < end:
        r = 0; s = 0
        while True:
            b = buf[pos]; pos += 1
            r |= (b & 0x7F) << s
            if not b & 0x80: break
            s += 7
        yield r, pos

def varint(buf, pos):
    r = 0; s = 0
    while True:
        b = buf[pos]; pos += 1
        r |= (b & 0x7F) << s
        if not b & 0x80: return r, pos
        s += 7

def zigzag(v): return (v >> 1) ^ -(v & 1)

def fields(buf, pos=0, end=None):
    """Yield (field_no, wire_type, value_or_slice)."""
    if end is None: end = len(buf)
    while pos < end:
        tag, pos = varint(buf, pos)
        f, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = varint(buf, pos)
            yield f, wt, v
        elif wt == 2:
            ln, pos = varint(buf, pos)
            yield f, wt, buf[pos:pos+ln]
            pos += ln
        elif wt == 5:
            yield f, wt, buf[pos:pos+4]; pos += 4
        elif wt == 1:
            yield f, wt, buf[pos:pos+8]; pos += 8
        else:
            raise ValueError(f"wire type {wt}")

def packed_varints(b):
    out = []
    pos = 0
    while pos < len(b):
        v, pos = varint(b, pos)
        out.append(v)
    return out

def decode_blob(data):
    raw = None
    for f, wt, v in fields(data):
        if f == 1: raw = v
        elif f == 3: raw = zlib.decompress(v)
    return raw

def main(path):
    stats = {"node": [0, 0], "way": [0, 0], "relation": [0, 0]}  # count, id_sum
    tag_count = {"node": 0, "way": 0, "relation": 0}
    ref_sum = 0
    sample_nodes = []
    blobs = 0
    with open(path, "rb") as fh:
        while True:
            hl = fh.read(4)
            if len(hl) < 4: break
            (n,) = struct.unpack(">I", hl)
            bh = fh.read(n)
            btype, dsize = None, 0
            for f, wt, v in fields(bh):
                if f == 1: btype = v.decode()
                elif f == 3: dsize = v
            data = fh.read(dsize)
            if btype != "OSMData": continue
            blobs += 1
            block = decode_blob(data)
            st = []
            gran, lat_off, lon_off = 100, 0, 0
            groups = []
            for f, wt, v in fields(block):
                if f == 1:
                    st = [s for ff, _, s in fields(v) if ff == 1]
                elif f == 2: groups.append(v)
                elif f == 17: gran = v
                elif f == 19: lat_off = v
                elif f == 20: lon_off = v
            for g in groups:
                for f, wt, v in fields(g):
                    if f == 2:  # DenseNodes
                        ids = lats = lons = []
                        kv = []
                        for ff, _, vv in fields(v):
                            if ff == 1: ids = [zigzag(x) for x in packed_varints(vv)]
                            elif ff == 8: lats = [zigzag(x) for x in packed_varints(vv)]
                            elif ff == 9: lons = [zigzag(x) for x in packed_varints(vv)]
                            elif ff == 10: kv = packed_varints(vv)
                        cid = clat = clon = 0
                        # count tags from keys_vals (0-separated)
                        i = 0
                        for idd, la, lo in zip(ids, lats, lons):
                            cid += idd; clat += la; clon += lo
                            stats["node"][0] += 1
                            stats["node"][1] += cid
                            if len(sample_nodes) < 5 or cid == 1737819289:
                                sample_nodes.append(
                                    (cid, 1e-9*(lat_off+gran*clat),
                                     1e-9*(lon_off+gran*clon)))
                        while i < len(kv):
                            if kv[i] == 0: i += 1
                            else:
                                tag_count["node"] += 1; i += 2
                    elif f in (1, 3, 4):
                        kind = {1: "node", 3: "way", 4: "relation"}[f]
                        eid = None
                        nk = 0
                        for ff, _, vv in fields(v):
                            if ff == 1: eid = zigzag(vv) if f == 1 else vv
                            elif ff == 2: nk += len(packed_varints(vv))
                            elif ff == 8 and f == 3:
                                refs = [zigzag(x) for x in packed_varints(vv)]
                                c = 0
                                for r in refs:
                                    c += r; ref_sum += c
                            elif ff == 9 and f == 4:
                                mems = [zigzag(x) for x in packed_varints(vv)]
                                c = 0
                                for r in mems:
                                    c += r; ref_sum += c
                        stats[kind][0] += 1
                        stats[kind][1] += eid
                        tag_count[kind] += nk
    print("blobs(OSMData):", blobs)
    for k in ("node", "way", "relation"):
        print(f"{k}: count={stats[k][0]} id_sum={stats[k][1]} tags={tag_count[k]}")
    print("ref_sum:", ref_sum)
    print("sample_nodes:", [(i, round(a, 7), round(b, 7)) for i, a, b in sample_nodes[:8]])

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/root/reference/tests/test_files/monaco.osm.pbf")
