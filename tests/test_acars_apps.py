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


# ---------------------------------------------------------------- ADS-C

def test_adsc_basic_report_roundtrip():
    from aero_tpu.protocol import adsc
    payload = adsc.encode_basic_report(
        lat=-33.946111, lon=151.177222, alt_ft=37000,
        timestamp_s=1832.5, redundancy=True, accuracy=7, tcas=True)
    out = adsc.decode(payload)["adsc"]
    assert "decode_error" not in out
    (g,) = out["groups"]
    assert g["group"] == "basic_report"
    assert abs(g["lat"] - -33.946111) < 2e-4
    assert abs(g["lon"] - 151.177222) < 2e-4
    assert g["alt_ft"] == 37000
    assert g["timestamp_s"] == 1832.5
    assert g["tcas_operational"] is True
    assert g["accuracy"] == "<0.05 nm"


def test_adsc_multi_group_message():
    from aero_tpu.protocol import adsc
    payload = (adsc.encode_basic_report(51.4775, -0.461389, 24004, 600.0)
               + adsc.encode_flight_id("QFA127")
               + adsc.encode_earth_ref(273.2, 488.5, -1200)
               + adsc.encode_meteo(85.5, 288.3, -52.25)
               + adsc.encode_airframe_id("7C6DB8"))
    out = adsc.decode(payload)["adsc"]
    assert "decode_error" not in out
    names = [g["group"] for g in out["groups"]]
    assert names == ["basic_report", "flight_id", "earth_ref", "meteo",
                     "airframe_id"]
    by = {g["group"]: g for g in out["groups"]}
    assert by["flight_id"]["flight_id"] == "QFA127"
    assert abs(by["earth_ref"]["true_track_deg"] - 273.2) < 0.1
    assert by["earth_ref"]["gs_kt"] == 488.5
    assert by["earth_ref"]["vert_rate_fpm"] == -1200
    assert by["meteo"]["wind_speed_kt"] == 85.5
    assert abs(by["meteo"]["wind_dir_deg"] - 288.3) < 0.5
    assert by["meteo"]["temp_c"] == -52.25
    assert by["airframe_id"]["icao_hex"] == "7C6DB8"


def test_adsc_predicted_route_and_events():
    from aero_tpu.protocol import adsc
    payload = adsc.encode_predicted_route(
        {"lat": 10.5, "lon": -140.25, "alt_ft": 36000, "eta_s": 1234},
        {"lat": 11.5, "lon": -142.0, "alt_ft": 36000})
    out = adsc.decode(payload)["adsc"]
    (g,) = out["groups"]
    assert g["group"] == "predicted_route"
    assert abs(g["next_waypoint"]["lat"] - 10.5) < 2e-4
    assert g["next_waypoint"]["eta_s"] == 1234
    assert abs(g["next_plus_one"]["lon"] - -142.0) < 2e-4
    # event tag reuses the basic layout
    ev = adsc.encode_basic_report(0.0, 0.0, 1000, 0.0, tag=20)
    out = adsc.decode(ev)["adsc"]
    assert out["groups"][0]["group"] == "waypoint_change_event"


def test_adsc_ack_and_unknown_tag():
    from aero_tpu.protocol import adsc
    out = adsc.decode(adsc.encode_ack(9))["adsc"]
    assert out["groups"][0] == {"group": "ack", "tag": 3,
                                "contract_request_num": 9}
    out = adsc.decode(bytes([99, 1, 2, 3]))["adsc"]
    assert out["groups"][0]["group"] == "tag_99"
    assert out["decode_error"] is True


def test_adsc_truncated_is_graceful():
    from aero_tpu.protocol import adsc
    good = adsc.encode_basic_report(10.0, 20.0, 30000, 100.0)
    out = adsc.decode(good[:6])["adsc"]
    assert out["decode_error"] is True
    assert out["groups"][0]["truncated"] is True


# ---------------------------------------------------------------- CPDLC

def test_cpdlc_header_and_null_element():
    from aero_tpu.protocol import cpdlc
    # uplink UM20 CLIMB TO ... (args undecodable -> hex) with header
    pay = cpdlc.encode_at1(12, [(3, None)], msg_ref=7,
                           timestamp="14:32:06", downlink=False)
    out = cpdlc.decode("AT1", pay, downlink=False)["cpdlc"]
    assert out["type"] == "cpdlc_message"
    assert out["msg_id"] == 12
    assert out["msg_ref"] == 7
    assert out["timestamp"] == "14:32:06"
    assert out["elements"][0]["id"] == "UM3"
    assert out["elements"][0]["title"] == "ROGER"


def test_cpdlc_downlink_wilco():
    from aero_tpu.protocol import cpdlc
    pay = cpdlc.encode_at1(33, [(0, None)], msg_ref=12, downlink=True)
    out = cpdlc.decode("AT1", pay, downlink=True)["cpdlc"]
    assert out["msg_id"] == 33
    assert out["msg_ref"] == 12
    assert "timestamp" not in out
    assert out["elements"][0]["id"] == "DM0"
    assert out["elements"][0]["title"] == "WILCO"


def test_cpdlc_freetext_roundtrip():
    from aero_tpu.protocol import cpdlc
    txt = "DUE TO WX REQUEST FL390"
    pay = cpdlc.encode_at1(5, [(67, txt)], downlink=True)
    out = cpdlc.decode("AT1", pay, downlink=True)["cpdlc"]
    assert out["elements"][0]["id"] == "DM67"
    assert out["elements"][0]["freetext"] == txt


def test_cpdlc_multi_element():
    from aero_tpu.protocol import cpdlc
    pay = cpdlc.encode_at1(44, [(165, None), (169, "CHECK ATIS")],
                           downlink=False)
    out = cpdlc.decode("AT1", pay, downlink=False)["cpdlc"]
    ids = [e["id"] for e in out["elements"]]
    assert ids == ["UM165", "UM169"]
    assert out["elements"][0]["title"] == "THEN"
    assert out["elements"][1]["freetext"] == "CHECK ATIS"


def test_cpdlc_unknown_args_degrade_to_hex():
    from aero_tpu.protocol import cpdlc
    from aero_tpu.protocol.bitio import BitWriter
    w = BitWriter()
    w.write(0, 1)          # no extra elements
    w.write(0, 2)          # no msg_ref / timestamp
    w.write(9, 6)          # msg id
    w.write(20, 8)         # UM20 CLIMB TO [altitude]
    w.write(0x2AB, 12)     # altitude argument bits we don't parse
    out = cpdlc.decode("AT1", w.to_bytes(), downlink=False)["cpdlc"]
    el = out["elements"][0]
    assert el["id"] == "UM20"
    assert "CLIMB TO" in el["title"]
    assert "args_hex" in el


def test_cpdlc_message_set_tables():
    from aero_tpu.protocol import cpdlc
    # complete, hole-free tables
    assert sorted(cpdlc.UPLINK_TITLES) == list(range(183))
    assert sorted(cpdlc.DOWNLINK_TITLES) == list(range(81))
    assert cpdlc.UPLINK_TITLES[169] == "[free text]"
    assert cpdlc.DOWNLINK_TITLES[56] == "MAYDAY MAYDAY MAYDAY"


def test_cpdlc_session_imis():
    from aero_tpu.protocol import cpdlc
    out = cpdlc.decode("DR1", b"\x01\x02", downlink=True)["cpdlc"]
    assert out["type"] == "cpdlc_disconnect_request"
    assert out["payload_hex"] == "0102"


# ------------------------------------------------- ARINC 622 integration

def test_arinc622_adsc_envelope_end_to_end():
    from aero_tpu.protocol import adsc
    from aero_tpu.protocol.acars_apps import build_arinc622, decode_apps
    payload = (adsc.encode_basic_report(35.0, -40.0, 38000, 900.0)
               + adsc.encode_flight_id("UAL27"))
    text = build_arinc622("PORTSYA", "ADS", "N778UA", payload)
    parsed = decode_apps("B6", text, downlink=True)
    assert parsed["app"] == "ads-c"
    assert parsed["arinc622"]["crc_ok"] is True
    assert parsed["arinc622"]["reg"] == "N778UA"
    groups = parsed["adsc"]["groups"]
    assert groups[0]["group"] == "basic_report"
    assert groups[1]["flight_id"] == "UAL27"


def test_arinc622_cpdlc_envelope_end_to_end():
    from aero_tpu.protocol import cpdlc
    from aero_tpu.protocol.acars_apps import build_arinc622, decode_apps
    pay = cpdlc.encode_at1(17, [(0, None)], msg_ref=3, downlink=True)
    text = build_arinc622("AKLCDYA", "AT1", "ZK-OKQ", pay)
    parsed = decode_apps("BA", text, downlink=True)
    assert parsed["app"] == "cpdlc"
    assert parsed["arinc622"]["crc_ok"] is True
    assert parsed["cpdlc"]["elements"][0]["title"] == "WILCO"


def test_arinc622_bad_crc_flagged_not_fatal():
    from aero_tpu.protocol import adsc
    from aero_tpu.protocol.acars_apps import build_arinc622, decode_apps
    text = build_arinc622("PORTSYA", "ADS", "N1", adsc.encode_ack(1))
    text = text[:-1] + ("0" if text[-1] != "0" else "1")
    parsed = decode_apps("B6", text, downlink=True)
    assert parsed["arinc622"]["crc_ok"] is False
    assert parsed["adsc"]["groups"][0]["group"] == "ack"


def test_afn_envelope():
    from aero_tpu.protocol.acars_apps import decode_apps
    text = "/AKLCDYA.AFN/FMHZK-OKQ,260790/FPON470W1230,120012,ABCD"
    parsed = decode_apps("B6", text, downlink=True)
    assert parsed["app"] == "afn"
    tags = [f["tag"] for f in parsed["afn"]["fields"]]
    assert tags == ["FMH", "FPO"]
    assert parsed["afn"]["fields"][0]["data"].startswith("ZK-OKQ")
    assert parsed["afn"]["crc_hex"] == "ABCD"


# ------------------------------------- FANS-1/A full argument round trips

def _gen_value(typ, rng):
    """Random valid value for a UPER combinator (None for NULL)."""
    from aero_tpu.protocol import uper
    if isinstance(typ, uper.NULL):
        return None
    if isinstance(typ, uper.INT):
        raw = rng.randint(typ.lo, typ.hi)
        if typ.scale == 1:
            return raw
        v = raw * typ.scale
        return round(v, 10) if isinstance(v, float) else v
    if isinstance(typ, uper.ENUM):
        return rng.choice(typ.names)
    if isinstance(typ, uper.SEQ):
        out = {}
        for name, ftyp, opt in typ.fields:
            if opt and rng.random() < 0.5:
                continue
            v = _gen_value(ftyp, rng)
            out[name] = True if v is None else v
        return out
    if isinstance(typ, uper.CHOICE):
        name, alt = rng.choice(typ.alts)
        v = _gen_value(alt, rng)
        return {name: True if v is None else v}
    if isinstance(typ, uper.SEQOF):
        n = rng.randint(typ.lo, min(typ.hi, typ.lo + 3))
        return [_gen_value(typ.typ, rng) for _ in range(n)]
    if isinstance(typ, uper.NUMSTR):
        n = rng.randint(typ.lo, min(typ.hi, typ.lo + 6))
        return "".join(rng.choice("0123456789") for _ in range(n))
    if isinstance(typ, uper._String):
        n = rng.randint(typ.lo, min(typ.hi, typ.lo + 6))
        return "".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")
                       for _ in range(n))
    raise AssertionError(f"unhandled type {typ}")


def test_fans_every_element_argument_round_trips():
    """decode(encode(v)) == v for a random value of EVERY UM/DM argument
    type, and the decode consumes exactly the encoded bits."""
    import random
    from aero_tpu.protocol import fans
    from aero_tpu.protocol.bitio import BitReader, BitWriter
    from aero_tpu.protocol.uper import NULL

    rng = random.Random(0x622)
    for argmap, kind in ((fans.UM_ARGS, "UM"), (fans.DM_ARGS, "DM")):
        for num, typ in sorted(argmap.items()):
            if isinstance(typ, NULL):
                continue
            for _ in range(8):
                v = _gen_value(typ, rng)
                w = BitWriter()
                typ.enc(w, v)
                r = BitReader(w.to_bytes())
                got = typ.dec(r)
                assert got == v, f"{kind}{num}: {got!r} != {v!r}"
                assert w.bit_len - r.pos == 0, f"{kind}{num}: bit misalign"


def test_fans_every_element_through_at1_path():
    """Every element also survives the full AT1 encode -> decode path
    (header + choice index + args + multi-element renders)."""
    import random
    from aero_tpu.protocol import cpdlc, fans
    from aero_tpu.protocol.uper import NULL

    rng = random.Random(0xA1)
    for argmap, downlink in ((fans.UM_ARGS, False), (fans.DM_ARGS, True)):
        for num, typ in sorted(argmap.items()):
            v = None if isinstance(typ, NULL) else _gen_value(typ, rng)
            pay = cpdlc.encode_at1(rng.randint(0, 63), [(num, v)],
                                   downlink=downlink)
            out = cpdlc.decode("AT1", pay, downlink=downlink)["cpdlc"]
            el = out["elements"][0]
            assert el["id"] == f"{'DM' if downlink else 'UM'}{num}"
            assert "args_hex" not in el, el
            assert "text" in el
            if v is not None:
                got = el.get("args", el.get("freetext"))
                assert got == v, f"{el['id']}: {got!r} != {v!r}"


def test_fans_rendered_titles():
    from aero_tpu.protocol import cpdlc
    pay = cpdlc.encode_at1(1, [(20, {"flight_level": 350})],
                           downlink=False)
    el = cpdlc.decode("AT1", pay, downlink=False)["cpdlc"]["elements"][0]
    assert el["text"] == "CLIMB TO AND MAINTAIN FL350"

    pay = cpdlc.encode_at1(2, [(117, {
        "unit_name": {"facility": {"designation": "KZAK"},
                      "function": "center"},
        "frequency": {"hf_khz": 8843}})], downlink=False)
    el = cpdlc.decode("AT1", pay, downlink=False)["cpdlc"]["elements"][0]
    assert el["text"] == "CONTACT KZAK CENTER 8843 kHz"

    pay = cpdlc.encode_at1(3, [(123, [4, 6, 1, 2])], downlink=False)
    el = cpdlc.decode("AT1", pay, downlink=False)["cpdlc"]["elements"][0]
    assert el["text"] == "SQUAWK 4612"


def test_cpdlc_connect_request_facility():
    from aero_tpu.protocol import cpdlc
    from aero_tpu.protocol.bitio import BitWriter
    w = BitWriter()
    for ch in "NZZO":
        w.write(ord(ch), 7)
    out = cpdlc.decode("CR1", w.to_bytes(), downlink=False)["cpdlc"]
    assert out["type"] == "cpdlc_connect_request"
    assert out["facility_designation"] == "NZZO"
    assert "payload_hex" in out


# ------------------------------------------- ADS-C contract-request decode

def test_adsc_periodic_contract_request_round_trip():
    from aero_tpu.protocol import adsc
    pay = adsc.encode_periodic_contract_request(
        5, interval_s=512, group_moduli={12: 1, 16: 4})
    out = adsc.decode(pay, downlink=False)["adsc"]
    g = out["groups"][0]
    assert g["group"] == "periodic_contract_request"
    assert g["contract_num"] == 5
    assert g["reporting_interval_s"] == 512
    reqs = {r["group"]: r["modulus"] for r in g["group_requests"]}
    assert reqs == {"flight_id": 1, "meteo": 4}
    assert "decode_error" not in out


def test_adsc_event_contract_request_round_trip():
    from aero_tpu.protocol import adsc
    events = [{"event": "lateral_deviation_change", "tag": 10,
               "threshold_nm": 2.0},
              {"event": "altitude_range_change", "tag": 19,
               "ceiling_ft": 40000, "floor_ft": 36000},
              {"event": "waypoint_change", "tag": 20}]
    pay = adsc.encode_event_contract_request(9, events)
    out = adsc.decode(pay, downlink=False)["adsc"]
    g = out["groups"][0]
    assert g["group"] == "event_contract_request"
    assert g["events"] == events
    assert "decode_error" not in out


def test_adsc_noncompliance_round_trip():
    from aero_tpu.protocol import adsc
    pay = adsc.encode_noncompliance(3, [(13, 1), (16, 2)])
    out = adsc.decode(pay, downlink=True)["adsc"]
    g = out["groups"][0]
    assert g["group"] == "noncompliance_notification"
    assert g["contract_request_num"] == 3
    assert g["noncomplying_groups"] == [{"tag": 13, "reason": 1},
                                        {"tag": 16, "reason": 2}]


# ------------------------------------------------- adversarial robustness

def test_app_decoders_never_raise_on_garbage():
    """The reference's contract (and libacars'): malformed payloads
    degrade, never throw.  Fuzz all three binary decoders."""
    import random
    from aero_tpu.protocol import adsc, cpdlc
    from aero_tpu.protocol.acars_apps import decode_apps

    rng = random.Random(0xFADE)
    for trial in range(300):
        n = rng.randint(0, 40)
        payload = bytes(rng.randrange(256) for _ in range(n))
        adsc.decode(payload, downlink=bool(trial % 2))
        for imi in ("AT1", "CR1", "CC1", "DR1"):
            cpdlc.decode(imi, payload, downlink=bool(trial % 2))
        # and through the text envelope path with random printable junk
        txt = "".join(chr(rng.randint(0x20, 0x7E)) for _ in range(n))
        decode_apps("H1", txt, downlink=bool(trial % 2))
        decode_apps("A6", "/" + txt, downlink=bool(trial % 2))
