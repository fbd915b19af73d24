"""Net layer tests: packet wire format, fragmentation/reassembly,
partial-frame concealment input, ack serdes, pacer (reference
net/packet.cc, net/pacer.hh)."""
import random

import pytest

from alfalfa_tpu.net import AckPacket, FragmentedFrame, Packet, Pacer


def test_packet_roundtrip():
    rng = random.Random(1)
    for _ in range(50):
        p = Packet(connection_id=rng.randrange(1 << 16),
                   source_state=rng.randrange(1 << 32),
                   target_state=rng.randrange(1 << 32),
                   frame_no=rng.randrange(1 << 32),
                   fragment_no=3, fragments_in_this_frame=7,
                   time_since_last=rng.randrange(1 << 32),
                   payload=bytes(rng.randrange(256)
                                 for _ in range(rng.randrange(1, 1400))))
        q = Packet.parse(p.to_bytes())
        for f in Packet.__slots__:
            assert getattr(p, f) == getattr(q, f)


def test_packet_wire_layout():
    """Header layout must match the reference byte-for-byte
    (packet.cc:90-109): little-endian u16/u32 fields, 22-byte header."""
    p = Packet(connection_id=0x0102, source_state=0x03040506,
               target_state=0x0708090a, frame_no=0x0b0c0d0e,
               fragment_no=0x0f10, fragments_in_this_frame=0x1112,
               time_since_last=0x13141516, payload=b"XY")
    raw = p.to_bytes()
    assert raw[:22] == bytes([0x02, 0x01,
                              0x06, 0x05, 0x04, 0x03,
                              0x0a, 0x09, 0x08, 0x07,
                              0x0e, 0x0d, 0x0c, 0x0b,
                              0x10, 0x0f,
                              0x12, 0x11,
                              0x16, 0x15, 0x14, 0x13])
    assert raw[22:] == b"XY"


def test_packet_validation():
    with pytest.raises(ValueError):
        Packet.parse(Packet(fragment_no=5, fragments_in_this_frame=5,
                            payload=b"x").to_bytes())
    with pytest.raises(ValueError):
        Packet.parse(Packet(fragment_no=0, fragments_in_this_frame=1,
                            payload=b"").to_bytes())


def test_fragmentation_roundtrip():
    rng = random.Random(2)
    frame = bytes(rng.randrange(256) for _ in range(5000))
    out = FragmentedFrame(7, 111, 222, 9, 12345, whole_frame=frame)
    assert out.fragments_in_this_frame == 4  # ceil(5000/1400)
    assert out.complete()
    assert out.frame() == frame
    # only fragment 0 carries time_since_last
    assert out.packets()[0].time_since_last == 12345
    assert all(p.time_since_last == 0 for p in out.packets()[1:])

    # reassemble from shuffled wire packets
    wire = [Packet.parse(p.to_bytes()) for p in out.packets()]
    rng.shuffle(wire)
    inc = FragmentedFrame(7, packet=wire[0])
    assert not inc.complete()
    for p in wire[1:]:
        inc.add_packet(p)
    assert inc.complete()
    assert inc.frame() == frame
    assert inc.source_state == 111 and inc.target_state == 222


def test_partial_frame_prefix():
    frame = bytes(range(256)) * 20  # 5120 bytes -> 4 fragments
    out = FragmentedFrame(1, 0, 0, 0, 0, whole_frame=frame)
    pkts = out.packets()
    inc = FragmentedFrame(1, packet=pkts[0])
    inc.add_packet(pkts[2])  # gap at fragment 1
    assert not inc.complete()
    # partial_frame stops at the first missing fragment
    assert inc.partial_frame() == frame[:1400]
    inc.add_packet(pkts[1])
    assert inc.partial_frame() == frame[:4200]


def test_ack_roundtrip():
    a = AckPacket(99, 1000, 3, 4567, 0xdeadbeef,
                  [0x11111111, 0x22222222, 0x33333333])
    b = AckPacket.parse(a.to_bytes())
    assert (b.connection_id, b.frame_no, b.fragment_no, b.avg_delay,
            b.current_state) == (99, 1000, 3, 4567, 0xdeadbeef)
    assert b.complete_states == a.complete_states
    # empty state list
    c = AckPacket.parse(AckPacket(1, 2, 3, 4, 5, []).to_bytes())
    assert c.complete_states == []


def test_pacer_spacing():
    pacer = Pacer()
    assert pacer.ms_until_due() == 1000
    pacer.push(b"a", 0)
    assert pacer.ms_until_due() == 0
    pacer.push(b"b", 50_000)  # 50 ms after "a"
    assert pacer.front() == b"a"
    pacer.pop()
    assert 0 < pacer.ms_until_due() <= 50
    pacer.pop()
    assert pacer.empty()
