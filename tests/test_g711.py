"""G.711 µ-law / A-law codec (audio/g711.py) — the real non-WAV decode
path behind the validator's registry (round-4 verdict #9)."""

import warnings

import numpy as np
import pytest


def _audioop():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
    return audioop


class TestTables:
    def test_ulaw_table_matches_stdlib_oracle(self):
        from schema_guru_ray.audio.g711 import ULAW_TABLE

        audioop = _audioop()
        want = np.frombuffer(
            audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2"
        )
        assert np.array_equal(ULAW_TABLE, want)

    def test_alaw_table_matches_stdlib_oracle(self):
        from schema_guru_ray.audio.g711 import ALAW_TABLE

        audioop = _audioop()
        want = np.frombuffer(
            audioop.alaw2lin(bytes(range(256)), 2), dtype="<i2"
        )
        assert np.array_equal(ALAW_TABLE, want)

    def test_encode_is_nearest_codeword(self):
        """Every int16 sample must map to the codeword whose decoded value
        is closest (exhaustive over a dense grid)."""
        from schema_guru_ray.audio.g711 import ULAW_TABLE, ulaw_decode, ulaw_encode

        x = np.arange(-32768, 32768, 37, dtype=np.int16)
        got = ulaw_decode(ulaw_encode(x)).astype(np.int64)
        err_got = np.abs(got - x.astype(np.int64))
        # brute-force nearest over the whole table
        best = np.min(
            np.abs(ULAW_TABLE.astype(np.int64)[None, :] - x.astype(np.int64)[:, None]),
            axis=1,
        )
        assert np.array_equal(err_got, best)

    def test_decode_of_encode_is_fixed_point(self):
        """Values already on the decode lattice round-trip exactly."""
        from schema_guru_ray.audio.g711 import (
            ALAW_TABLE, ULAW_TABLE, alaw_decode, alaw_encode,
            ulaw_decode, ulaw_encode,
        )

        assert np.array_equal(ulaw_decode(ulaw_encode(ULAW_TABLE)), ULAW_TABLE)
        assert np.array_equal(alaw_decode(alaw_encode(ALAW_TABLE)), ALAW_TABLE)


class TestWavContainer:
    def test_roundtrip_snr(self):
        from schema_guru_ray.audio.g711 import decode_wav_g711, encode_wav_g711
        from schema_guru_ray.audio.wav import snr_db

        sr = 8000
        t = np.arange(sr, dtype=np.float64) / sr
        pcm = (0.6 * 32767 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
        for law in ("ulaw", "alaw"):
            buf = encode_wav_g711(pcm, sr, law)
            dec, sr2 = decode_wav_g711(buf)
            assert sr2 == sr and len(dec) == len(pcm)
            # G.711 companding of a 0.6-FS sine sits well above the
            # validator's 30 dB threshold
            assert snr_db(pcm, dec) > 33.0

    def test_strict_errors(self):
        from schema_guru_ray.audio.g711 import decode_wav_g711, encode_wav_g711
        from schema_guru_ray.audio.wav import WavDecodeError, encode_wav

        pcm = np.zeros(100, dtype=np.int16)
        with pytest.raises(WavDecodeError):
            decode_wav_g711(b"not a wav")
        with pytest.raises(WavDecodeError):
            decode_wav_g711(encode_wav(pcm, 8000))  # PCM16 tag, not G.711
        buf = encode_wav_g711(pcm, 8000, "ulaw")
        with pytest.raises(WavDecodeError):
            decode_wav_g711(buf[:-4])  # truncated


@pytest.mark.usefixtures("ray_session")
class TestValidatorIntegration:
    def test_mulaw_clip_validates_in_strict_mode(self):
        """A µ-law clip decodes FOR REAL (strict_codecs raises only for the
        genuinely-absent codecs) and passes the SNR≥30 + transcript
        invariants; an mp3-labelled clip still hits the honest stub."""
        import pyarrow as pa

        from schema_guru_ray.audio import synth
        from schema_guru_ray.audio.g711 import encode_wav_g711
        from schema_guru_ray.audio.wav import encode_wav
        from schema_guru_ray.stages.audio import ClipValidator

        sr = 8000
        n = sr  # 1 s
        rows = []
        for cid, codec in (("u1", "pcm_mulaw"), ("a1", "pcm_alaw"), ("m1", "mp3")):
            ref = synth.reference_pcm(cid, sr, n)
            if codec == "pcm_mulaw":
                buf = encode_wav_g711(ref, sr, "ulaw")
            elif codec == "pcm_alaw":
                buf = encode_wav_g711(ref, sr, "alaw")
            else:
                buf = encode_wav(ref, sr)
            rows.append(
                dict(clip_id=cid, bytes=buf, sr_hz=sr, dur_ms=1000,
                     codec=codec, transcript=synth.reference_transcript(cid))
            )
        batch = pa.Table.from_pylist(rows)
        out = ClipValidator(strict_codecs=True)(batch).to_pandas()
        by = out.set_index("clip_id")
        assert bool(by.loc["u1", "decodable"]) and bool(by.loc["u1", "ok"])
        assert bool(by.loc["a1", "decodable"]) and bool(by.loc["a1", "ok"])
        assert by.loc["u1", "snr_db"] > 30.0
        assert by.loc["a1", "snr_db"] > 30.0
        # mp3 stays an honest stub in strict mode
        assert not bool(by.loc["m1", "decodable"])
        assert "undecodable_audio" in list(by.loc["m1", "violations"])
