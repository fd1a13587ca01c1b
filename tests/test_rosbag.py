"""ROS1 bag reader round-trip tests (writer -> reader, no ROS needed)."""

import struct

import numpy as np
import pytest

from sonar_slam_tpu.io.rosbag import (
    MessageType,
    read_bag,
    write_bag,
    bag_to_streams,
    ROS_TOPICS,
)

HEADER_DEF = """\
uint32 seq
time stamp
string frame_id
"""

DVL_DEF = """\
Header header
geometry_msgs/Vector3 velocity
float64 altitude
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
================================================================================
MSG: geometry_msgs/Vector3
float64 x
float64 y
float64 z
"""

PING_DEF = """\
Header header
int32 ping_id
float64 range_resolution
uint32 num_ranges
int16[] bearings
uint8[] data
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
"""


def ser_header(seq, t, frame):
    b = frame.encode()
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return struct.pack("<III", seq, secs, nsecs) + struct.pack("<I", len(b)) + b


def ser_dvl(seq, t, vx, vy, vz, alt):
    return ser_header(seq, t, "dvl") + struct.pack("<dddd", vx, vy, vz, alt)


def ser_ping(seq, t, ping_id, res, nr, bearings, data):
    out = ser_header(seq, t, "sonar")
    out += struct.pack("<idI", ping_id, res, nr)
    out += struct.pack("<I", len(bearings)) + np.asarray(bearings, "<i2").tobytes()
    out += struct.pack("<I", len(data)) + bytes(data)
    return out


def test_message_type_parses_and_decodes():
    mt = MessageType("rti_dvl/DVL", DVL_DEF)
    raw = ser_dvl(7, 123.5, 0.1, -0.2, 0.05, 12.0)
    msg = mt.decode(raw)
    assert msg["header"]["seq"] == 7
    np.testing.assert_allclose(msg["header"]["stamp"], 123.5, atol=1e-6)
    np.testing.assert_allclose(
        [msg["velocity"]["x"], msg["velocity"]["y"], msg["velocity"]["z"]],
        [0.1, -0.2, 0.05],
    )
    assert msg["altitude"] == 12.0


def test_bag_roundtrip(tmp_path):
    path = str(tmp_path / "test.bag")
    conns = [
        {"id": 0, "topic": "/rti/body_velocity/raw", "type": "rti_dvl/DVL",
         "definition": DVL_DEF},
        {"id": 1, "topic": "/sonar_oculus_node/M750d/ping",
         "type": "sonar_oculus/OculusPing", "definition": PING_DEF},
    ]
    msgs = [
        (0, 10.0, ser_dvl(0, 10.0, 0.3, 0.0, 0.0, 5.0)),
        (1, 10.2, ser_ping(0, 10.2, 42, 0.06, 4, [-100, 0, 50, 100],
                           [1, 2, 3, 4, 250])),
        (0, 10.4, ser_dvl(1, 10.4, 0.31, 0.01, 0.0, 5.0)),
    ]
    write_bag(path, conns, msgs)

    out = list(read_bag(path))
    assert len(out) == 3
    topic0, t0, m0 = out[0]
    assert topic0 == "/rti/body_velocity/raw"
    np.testing.assert_allclose(t0, 10.0, atol=1e-6)
    assert m0["velocity"]["x"] == 0.3

    topic1, _, ping = out[1]
    assert ping["ping_id"] == 42
    np.testing.assert_array_equal(np.asarray(ping["bearings"]),
                                  [-100, 0, 50, 100])
    np.testing.assert_array_equal(np.asarray(ping["data"]), [1, 2, 3, 4, 250])


def test_topic_filter(tmp_path):
    path = str(tmp_path / "f.bag")
    conns = [{"id": 0, "topic": "/a", "type": "rti_dvl/DVL", "definition": DVL_DEF},
             {"id": 1, "topic": "/b", "type": "rti_dvl/DVL", "definition": DVL_DEF}]
    msgs = [(0, 1.0, ser_dvl(0, 1.0, 0, 0, 0, 0)),
            (1, 2.0, ser_dvl(0, 2.0, 1, 1, 1, 0))]
    write_bag(path, conns, msgs)
    out = list(read_bag(path, topics={"/b"}))
    assert len(out) == 1 and out[0][0] == "/b"


def test_bag_to_streams(tmp_path):
    IMU_DEF = """\
Header header
geometry_msgs/Quaternion orientation
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
================================================================================
MSG: geometry_msgs/Quaternion
float64 x
float64 y
float64 z
float64 w
"""
    DEPTH_DEF = """\
Header header
float64 depth
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
"""

    def ser_imu(seq, t, yaw):
        # quaternion for pure yaw
        return ser_header(seq, t, "imu") + struct.pack(
            "<dddd", 0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)
        )

    def ser_depth(seq, t, d):
        return ser_header(seq, t, "bar") + struct.pack("<d", d)

    path = str(tmp_path / "s.bag")
    conns = [
        {"id": 0, "topic": ROS_TOPICS["imu"], "type": "sensor_msgs/Imu",
         "definition": IMU_DEF},
        {"id": 1, "topic": ROS_TOPICS["dvl"], "type": "rti_dvl/DVL",
         "definition": DVL_DEF},
        {"id": 2, "topic": ROS_TOPICS["depth"], "type": "bar30_depth/Depth",
         "definition": DEPTH_DEF},
        {"id": 3, "topic": ROS_TOPICS["sonar"], "type": "sonar_oculus/OculusPing",
         "definition": PING_DEF},
    ]
    msgs = [
        (0, 5.0, ser_imu(0, 5.0, 0.5)),
        (1, 5.05, ser_dvl(0, 5.05, 0.4, 0, 0, 3.0)),
        (2, 5.02, ser_depth(0, 5.02, 2.5)),
        (3, 5.1, ser_ping(0, 5.1, 0, 0.06, 4, [0, 1, 2, 3], [9, 9, 9])),
    ]
    write_bag(path, conns, msgs)
    streams, pings = bag_to_streams(path)
    assert len(streams.imu_time) == 1
    np.testing.assert_allclose(streams.imu_rpy[0, 2], 0.5, atol=1e-6)
    np.testing.assert_allclose(streams.dvl_vel[0], [0.4, 0, 0], atol=1e-6)
    np.testing.assert_allclose(streams.depth[0], 2.5)
    assert len(pings) == 1 and pings[0]["ping_id"] == 0


def test_unchunked_records(tmp_path):
    """Bags can store records at top level (no chunk wrapper)."""
    from sonar_slam_tpu.io.rosbag import (
        MAGIC, OP_BAG_HEADER, _encode_record, _encode_header,
    )
    import struct as _s

    path = str(tmp_path / "unchunked.bag")
    conn_header = {b"op": bytes([0x07]), b"conn": _s.pack("<I", 0),
                   b"topic": b"/a"}
    conn_payload = _encode_header({
        b"topic": b"/a", b"type": b"rti_dvl/DVL", b"md5sum": b"0" * 32,
        b"message_definition": DVL_DEF.encode(),
    })
    msg_header = {b"op": bytes([0x02]), b"conn": _s.pack("<I", 0),
                  b"time": _s.pack("<II", 3, 0)}
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(_encode_record({b"op": bytes([OP_BAG_HEADER])}, b""))
        f.write(_encode_record(conn_header, conn_payload))
        f.write(_encode_record(msg_header, ser_dvl(0, 3.0, 0.1, 0.2, 0.0, 1.0)))
    out = list(read_bag(path))
    assert len(out) == 1
    assert out[0][2]["velocity"]["y"] == 0.2


def test_bz2_chunk(tmp_path):
    """bz2-compressed chunks decode."""
    import bz2 as _bz2
    import struct as _s
    from sonar_slam_tpu.io.rosbag import MAGIC, _encode_record, _encode_header

    chunk = _encode_record(
        {b"op": bytes([0x07]), b"conn": _s.pack("<I", 0), b"topic": b"/a"},
        _encode_header({b"topic": b"/a", b"type": b"rti_dvl/DVL",
                        b"md5sum": b"0" * 32,
                        b"message_definition": DVL_DEF.encode()}),
    ) + _encode_record(
        {b"op": bytes([0x02]), b"conn": _s.pack("<I", 0),
         b"time": _s.pack("<II", 9, 0)},
        ser_dvl(0, 9.0, 0.5, 0.0, 0.0, 2.0),
    )
    comp = _bz2.compress(chunk)
    path = str(tmp_path / "bz2.bag")
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(_encode_record(
            {b"op": bytes([0x05]), b"compression": b"bz2",
             b"size": _s.pack("<I", len(chunk))}, comp))
    out = list(read_bag(path))
    assert len(out) == 1 and out[0][2]["velocity"]["x"] == 0.5
