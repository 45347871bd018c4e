"""Aircraft-registration DB: working CSV lookup behind the reference's
stub contract (ref decode/databasetext.cpp:42-61 always answers empty;
the schema and the pre-emission hook are retained there — here an
opt-in CSV restores the capability JAERO's authors cut out)."""

import json
import wave

import numpy as np

from aero_tpu.protocol.database import (DATABASE_SCHEMA, DataBaseCSVUser,
                                        DataBaseTextUser)

CSV = """ICAO24,Registration,Manufacturer,ICAOTypeCode,Type,RegisteredOwners
4001AA,VH-TST,Boeing,B789,787-9,Test Airways
ABC123,N425SK,Airbus,A359,A350-900,Example Air
"""


def _db(tmp_path):
    p = tmp_path / "aircraft.csv"
    p.write_text(CSV)
    return str(p)


def test_csv_lookup_and_stub_contract(tmp_path):
    db = DataBaseCSVUser(_db(tmp_path))
    assert len(db) == 2
    row = db.lookup("4001AA")
    assert row[:3] == ["4001AA", "VH-TST", "Boeing"]
    # leading-zero-insensitive (ICAO24 is a 24-bit number)
    assert db.lookup("04001AA".lstrip("0") or "0") == row
    assert db.lookup("FFFFFF") is None
    # request() keeps the reference's async-lookalike contract
    results = []
    db.on_result = lambda ok, ref, r: results.append((ok, r))
    db.request("", "4001AA")
    db.request("", "FFFFFF")
    assert results[0] == (True, row)
    assert results[1] == (False, [])
    # the stub still always answers not-found
    stub = DataBaseTextUser(lambda ok, ref, r: results.append((ok, r)))
    stub.request("", "4001AA")
    assert results[-1] == (False, [])


def test_db_enrichment_end_to_end(tmp_path):
    """Synthetic over-the-air message from a known AES -> jsondump line
    carries the aircraft object; unknown AES lines don't."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from aero_tpu.models.msk import msk_modulate
    from aero_tpu.protocol.framing import build_p_frames
    from aero_tpu.protocol.crc import append_crc16_bytes
    from aero_tpu.protocol.isu import make_acars_userdata, segment_isu
    from aero_tpu.io.output import to_output_format
    from aero_tpu.runtime.decoder import Decoder, DecoderOptions

    fill = append_crc16_bytes(bytes([0x01] + [0] * 9))
    fields = []
    for aes, reg, text in ((0x4001AA, "VH-TST", "KNOWN AIRCRAFT"),
                           (0x7799EE, "N000XX", "UNKNOWN AIRCRAFT")):
        ud = make_acars_userdata("2", reg, "!", "H1", "A", text)
        sus = [append_crc16_bytes(b) for b in segment_isu(ud, aes, 0x41)]
        while len(sus) % 6:
            sus.append(fill)
        fields += [b"".join(sus[i:i + 6]) for i in range(0, len(sus), 6)]
    bits = build_p_frames(fields, 1200, lead_frames=3)
    audio = msk_modulate(bits, 24000, 1200.0, freq=1000.0)
    wav = tmp_path / "db.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24000)
        w.writeframes((np.clip(audio, -1, 1) * 32767).astype("<i2")
                      .tobytes())

    import contextlib
    import io as _io
    dec = Decoder(DecoderOptions(bitrate=1200, station_id="DB",
                                 aircraft_db=_db(tmp_path)))
    with contextlib.redirect_stdout(_io.StringIO()):
        dec.run_file(str(wav))
    by_text = {i.message: i for i in dec.items}
    known = by_text["KNOWN AIRCRAFT"]
    assert known.dbinfo == dict(zip(
        DATABASE_SCHEMA,
        ["4001AA", "VH-TST", "Boeing", "B789", "787-9", "Test Airways"]))
    line = json.loads(to_output_format("jsondump", "DB", False, known))
    assert line["aircraft"]["Registration"] == "VH-TST"
    unknown = by_text["UNKNOWN AIRCRAFT"]
    assert unknown.dbinfo == {}
    assert "aircraft" not in json.loads(
        to_output_format("jsondump", "DB", False, unknown))
