#!/usr/bin/env python
"""Extract the /camera/imu topic of a VOID raw.bag into the rostopic-echo
CSV layout the loaders consume (capability parity with the reference's
`rostopic echo -b raw.bag -p /camera/imu > raw.csv` shell-out,
dataset/void_dataset_v3.py:52-58 — without requiring a ROS install).

Parses the rosbag 2.0 container format directly: record headers, chunk
decompression (none/bz2), and sensor_msgs/Imu message bodies.

Usage: python tools/rosbag_imu_to_csv.py path/to/raw.bag [out.csv]
"""
from __future__ import annotations

import bz2
import os
import struct
import sys

HEADER_COLS = ("time,field.header.seq,field.header.stamp,"
               "field.header.frame_id,field.orientation.x,"
               "field.orientation.y,field.orientation.z,field.orientation.w,"
               "field.angular_velocity.x,field.angular_velocity.y,"
               "field.angular_velocity.z,field.linear_acceleration.x,"
               "field.linear_acceleration.y,field.linear_acceleration.z")


def read_records(buf, offset, end):
    while offset < end:
        (hlen,) = struct.unpack_from("<I", buf, offset)
        offset += 4
        header = {}
        hend = offset + hlen
        while offset < hend:
            (flen,) = struct.unpack_from("<I", buf, offset)
            offset += 4
            field = buf[offset:offset + flen]
            offset += flen
            k, _, v = field.partition(b"=")
            header[k.decode()] = v
        (dlen,) = struct.unpack_from("<I", buf, offset)
        offset += 4
        data = buf[offset:offset + dlen]
        offset += dlen
        yield header, data


def parse_imu(data):
    """sensor_msgs/Imu body -> (seq, stamp_ns, orientation4, gyro3, acc3)."""
    off = 0
    seq, secs, nsecs = struct.unpack_from("<III", data, off)
    off += 12
    (slen,) = struct.unpack_from("<I", data, off)
    off += 4 + slen                       # frame_id string
    ori = struct.unpack_from("<4d", data, off)
    off += 32 + 72                        # orientation + covariance
    gyro = struct.unpack_from("<3d", data, off)
    off += 24 + 72
    acc = struct.unpack_from("<3d", data, off)
    stamp = secs * 10**9 + nsecs
    return seq, stamp, ori, gyro, acc


def main():
    bag_path = sys.argv[1]
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        os.path.splitext(bag_path)[0] + ".csv"

    with open(bag_path, "rb") as f:
        magic = f.readline()
        assert magic.startswith(b"#ROSBAG V2.0"), "not a rosbag 2.0 file"
        buf = f.read()

    imu_conns = set()
    rows = []
    for header, data in read_records(buf, 0, len(buf)):
        op = header.get("op", b"")
        if op == b"\x07":                 # connection
            topic = header.get("topic", b"").decode()
            if topic == "/camera/imu":
                (conn,) = struct.unpack("<I", header["conn"])
                imu_conns.add(conn)
        elif op == b"\x05":               # chunk
            comp = header.get("compression", b"none")
            payload = bz2.decompress(data) if comp == b"bz2" else data
            for h2, d2 in read_records(payload, 0, len(payload)):
                if h2.get("op") == b"\x07":
                    topic = h2.get("topic", b"").decode()
                    if topic == "/camera/imu":
                        (conn,) = struct.unpack("<I", h2["conn"])
                        imu_conns.add(conn)
                elif h2.get("op") == b"\x02":   # message data
                    (conn,) = struct.unpack("<I", h2["conn"])
                    if conn in imu_conns:
                        (t,) = struct.unpack("<Q", h2["time"])
                        rows.append((t, d2))

    with open(out_path, "w") as f:
        f.write(HEADER_COLS + "\n")
        for t, d in rows:
            seq, stamp, ori, gyro, acc = parse_imu(d)
            f.write(f"{t},{seq},{stamp},camera_imu,"
                    f"{ori[0]},{ori[1]},{ori[2]},{ori[3]},"
                    f"{gyro[0]},{gyro[1]},{gyro[2]},"
                    f"{acc[0]},{acc[1]},{acc[2]}\n")
    print(f"wrote {len(rows)} IMU rows to {out_path}")


if __name__ == "__main__":
    main()
