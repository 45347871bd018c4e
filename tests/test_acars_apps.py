"""ACARS application-layer decoding subset tests."""

from aero_tpu.protocol.acars_apps import (extract_sublabel_mfi, decode_apps,
                                          decode_media_advisory,
                                          decode_arinc622)


def test_sublabel_mfi_extraction():
    sub, mfi, rest = extract_sublabel_mfi("H1", "#DFB6HELLO")
    assert (sub, mfi) == ("DF", "B6")
    assert rest == "HELLO"
    sub, mfi, rest = extract_sublabel_mfi("H1", "no prefix")
    assert (sub, mfi, rest) == ("", "", "no prefix")


def test_oooi_labels():
    assert decode_apps("QA", "x", True)["oooi_event"] == "out"
    assert decode_apps("QD", "x", True)["oooi_event"] == "in"


def test_media_advisory():
    adv = decode_media_advisory("0EV123456VS")
    assert adv["media_advisory"]["state"] == "established"
    assert adv["media_advisory"]["current_link"] == "V"
    assert adv["media_advisory"]["time"] == "12:34:56"
    assert adv["media_advisory"]["available_links"] == ["V", "S"]


def test_arinc622_detect():
    out = decode_arinc622("/AKLCDYA.AT1.B-18722A9D4E5C")
    assert out is not None
    assert out["app"] == "cpdlc"
    assert out["arinc622"]["gs_addr"] == "AKLCDYA"
    assert out["arinc622"]["imi"] == "AT1"
    assert decode_arinc622("plain text") is None


def test_enrich_in_decoder_path():
    from aero_tpu.protocol.acars_apps import enrich
    from aero_tpu.protocol.isu import ACARSItem
    item = ACARSItem()
    item.LABEL = b"H1"
    item.message = "#DFB6POSITION"
    item.downlink = False
    item.valid = True
    enrich(item)
    assert item.parsed["sublabel"] == "DF"
    assert item.parsed["mfi"] == "B6"
