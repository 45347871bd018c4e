"""ISU reassembly + ACARS parsing + SU dispatch + output formats."""

import json

import numpy as np
import pytest

from aero_tpu.protocol.isu import (ISUData, RISUData, make_acars_userdata,
                                   segment_isu, ACARSItem)
from aero_tpu.protocol.acars import ParserISU
from aero_tpu.protocol.su_dispatch import PChannelSUDispatcher, create_c_assignment
from aero_tpu.protocol.crc import append_crc16_bytes
from aero_tpu.io.output import to_output_format


def test_isu_segment_reassemble_roundtrip():
    ud = make_acars_userdata("2", "N12345", "!", "H1", "A", "FST01TEST MESSAGE")
    sus = segment_isu(ud, aesid=0xABCDEF, gesid=0x41)
    isud = ISUData()
    done = None
    for su in sus:
        done = isud.update(su) or done
    assert done is not None
    assert done.AESID == 0xABCDEF
    assert done.GESID == 0x41
    assert done.userdata == ud


def test_acars_parse():
    ud = make_acarsud = make_acars_userdata("2", "VHOQA", "K", "H1", "B",
                                            "M01AQF0001 HELLO WORLD")
    item_holder = []
    parser = ParserISU(on_acars=item_holder.append)
    from aero_tpu.protocol.isu import ISUItem
    isu = ISUItem(AESID=0x3C0123, GESID=0x44, userdata=ud)
    assert parser.parse(isu)
    assert len(item_holder) == 1
    it = item_holder[0]
    assert not it.nonacars
    assert it.PLANEREG == b"VHOQA"
    assert it.LABEL == b"H1"
    assert chr(it.MODE) == "2"
    assert it.message == "M01AQF0001 HELLO WORLD"


def test_acars_defragment_etb():
    parser_out = []
    parser = ParserISU(on_acars=parser_out.append)
    from aero_tpu.protocol.isu import ISUItem
    ud1 = make_acars_userdata("2", "N777AA", "!", "H1", "A", "PART ONE ", etb=True)
    ud2 = make_acars_userdata("2", "N777AA", "!", "H1", "B", "PART TWO")
    parser.parse(ISUItem(AESID=1, GESID=2, userdata=ud1))
    assert len(parser_out) == 0          # held for reassembly
    parser.parse(ISUItem(AESID=1, GESID=2, userdata=ud2))
    assert len(parser_out) == 1
    assert parser_out[0].message == "PART ONE PART TWO"


def test_non_acars_hex():
    out = []
    parser = ParserISU(on_acars=out.append)
    from aero_tpu.protocol.isu import ISUItem
    parser.parse(ISUItem(AESID=5, GESID=6, userdata=bytes(range(10))))
    assert out[0].nonacars
    assert out[0].message == bytes(range(10)).hex().upper()


def test_su_dispatch_user_data_to_acars():
    acars = []
    disp = PChannelSUDispatcher(on_acars=acars.append)
    ud = make_acars_userdata("2", "G-ABCD", "!", "Q0", "C", "STATUS OK")
    for body in segment_isu(ud, aesid=0x123456, gesid=0x02):
        su12 = append_crc16_bytes(body)
        disp.dispatch(su12)
    assert len(acars) == 1
    assert acars[0].PLANEREG == b"G-ABCD"
    assert acars[0].message == "STATUS OK"


def test_su_dispatch_system_table():
    disp = PChannelSUDispatcher()
    # Psmc/Rsmc broadcast: freq = chan*0.0025 + 1510
    su = bytes([0x05, 0x00, 0x00, 0x44, 0x2E, 0xE0, 0x2E, 0xE1, 0x2E, 0xE2])
    line = disp.dispatch(append_crc16_bytes(su))
    assert "Psmc" in line and "1540.0000MHz" in line


def test_c_channel_assignment_decode():
    su = bytes([0x32, 0xAB, 0xCD, 0xEF, 0x41, 0x00, 0x2E, 0xE0, 0xAE, 0xE0, 0, 0])
    item = create_c_assignment(su)
    assert item.AESID == 0xABCDEF
    assert abs(item.receive_freq - (0x2EE0 * 0.0025 + 1510.0)) < 1e-9
    assert item.transmit_spotbeam
    assert abs(item.transmit_freq - (0x2EE0 * 0.0025 + 1611.5)) < 1e-9


def test_r_isu_reassembly():
    r = RISUData()
    # SEQINDICATOR=4,5,6: 3-part sequence, SUTYPE = bytes in last part
    aes = [0x0A, 0x0B, 0x0C]
    b2 = 0x21
    part1 = bytes([0x4B, b2] + aes + [0x77]) + b"AAAA"       # SUTYPE=11
    part2 = bytes([0x5B, b2] + aes + [0x77]) + b"BBBB"
    part3 = bytes([0x63, b2] + aes + [0x77]) + b"CCCC"       # SUTYPE=3
    assert r.update(part1.ljust(17, b"\x00") ) is None
    assert r.update(part2.ljust(17, b"\x00")) is None
    done = r.update(part3.ljust(17, b"\x00"))
    assert done is not None
    assert done.AESID == 0x0A0B0C


def test_output_formats():
    item = ACARSItem()
    item.isuitem.AESID = 0xABCDEF
    item.isuitem.GESID = 0x41
    item.MODE = ord("2")
    item.TAK = 0x15
    item.LABEL = b"H1"
    item.BI = ord("A")
    item.PLANEREG = b"N12345"
    item.downlink = True
    item.message = "M01AQF0001 HELLO"
    item.valid = True

    js = json.loads(to_output_format("jsondump", "TEST-STATION", False, item,
                                     now=1700000000.0))
    assert js["isu"]["src"]["addr"] == "ABCDEF"
    assert js["isu"]["acars"]["reg"] == "N12345"
    assert js["isu"]["acars"]["ack"] == "!"
    assert js["isu"]["acars"]["msg_num"] == "M01"
    assert js["isu"]["acars"]["flight"] == "QF0001"
    assert js["station"] == "TEST-STATION"

    ja = json.loads(to_output_format("jaero", "S", False, item, now=1700000000.0))
    assert ja["AESID"] == "ABCDEF" and ja["LABEL"] == "H1"

    tx = to_output_format("text", "S", False, item, now=1700000000.0)
    assert "AES:ABCDEF" in tx and "MSN=M01A" in tx and "FLT=QF0001" in tx
