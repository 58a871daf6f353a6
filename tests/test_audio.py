"""WAV codec, deterministic synthesis, clips generator, and the
ClipValidator kernel (unit level — actor-pool integration is covered in
test_validate_pipeline.py)."""

import numpy as np
import pytest

from schema_guru_ray.audio import synth
from schema_guru_ray.audio.wav import WavDecodeError, decode_wav, encode_wav, snr_db
from schema_guru_ray.sources.clips import ClipsConfig, generate_clips_table
from schema_guru_ray.stages.audio import ClipValidator


class TestWav:
    def test_roundtrip(self):
        pcm = synth.reference_pcm("x", 16000, 1234)
        dec, sr = decode_wav(encode_wav(pcm, 16000))
        assert sr == 16000 and np.array_equal(dec, pcm)

    def test_truncated_raises(self):
        buf = encode_wav(synth.reference_pcm("x", 8000, 100), 8000)
        for cut in (3, 10, 43, len(buf) - 1):
            with pytest.raises(WavDecodeError):
                decode_wav(buf[:cut])

    def test_garbage_raises(self):
        with pytest.raises(WavDecodeError):
            decode_wav(b"not audio at all, just bytes" * 4)

    def test_snr(self):
        pcm = synth.reference_pcm("y", 16000, 4000)
        assert snr_db(pcm, pcm) == float("inf")
        noisy = np.clip(
            pcm + np.random.default_rng(0).normal(0, 2000, pcm.shape), -32768, 32767
        ).astype(np.int16)
        assert snr_db(pcm, noisy) < 30
        assert snr_db(pcm, pcm[:100]) == float("-inf")


class TestSynth:
    def test_deterministic(self):
        a = synth.reference_pcm("clip-1", 16000, 2000)
        b = synth.reference_pcm("clip-1", 16000, 2000)
        assert np.array_equal(a, b)
        assert synth.reference_transcript("clip-1") == synth.reference_transcript("clip-1")

    def test_distinct_clips_differ(self):
        a = synth.reference_pcm("clip-1", 16000, 2000)
        b = synth.reference_pcm("clip-2", 16000, 2000)
        assert not np.array_equal(a, b)
        assert synth.reference_transcript("clip-1") != synth.reference_transcript("clip-2")

    def test_golden_bytes_pin_gen_version(self):
        # Cached corpora under /tmp/graft_clips are keyed by
        # sources/clips.py GEN_VERSION. If this test fails, the synthesis
        # math changed bytes: bump GEN_VERSION and re-pin these digests,
        # or stale caches will silently disagree with the validator.
        import hashlib
        from schema_guru_ray.sources.clips import GEN_VERSION

        assert GEN_VERSION == 3
        pins = {
            ("clip-1", 16000, 2000): "1df97a99d456a1f32deb532aa2d0d42d",
            ("golden-a", 8000, 800): "1bc7816a077eebaf696ff686ad9c3ddf",
            ("golden-b", 48000, 9600): "c145dd81b28ce26ca4c3f82daab0642a",
        }
        for (cid, sr, n), want in pins.items():
            got = hashlib.md5(synth.reference_pcm(cid, sr, n).tobytes()).hexdigest()
            assert got == want, f"reference_pcm({cid},{sr},{n}) bytes changed"
        assert synth.reference_transcript("clip-1") == (
            "bravo amber harbor reed sierra golf nectar reed bravo"
        )


CFG = ClipsConfig(
    rate_dup=0.02,
    rate_corrupt=0.02,
    rate_ref_transcript_on_bad=0.01,
    rate_ref_null_on_good=0.01,
    rate_snr=0.02,
    rate_transcript_mismatch=0.02,
    rate_sr_invalid=0.01,
    rate_dur_mismatch=0.02,
)


class TestClipsGenerator:
    def test_deterministic(self):
        assert generate_clips_table(100, CFG).equals(generate_clips_table(100, CFG))

    def test_schema(self):
        t = generate_clips_table(10, CFG)
        assert t.column_names == ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]

    def test_duplicates_are_byte_identical(self):
        # dup-only config: other injections are row-keyed and may legitimately
        # perturb one copy of a duplicated clip_id
        dup_cfg = ClipsConfig(
            rate_dup=0.02, rate_corrupt=0, rate_ref_transcript_on_bad=0,
            rate_ref_null_on_good=0, rate_snr=0, rate_transcript_mismatch=0,
            rate_sr_invalid=0, rate_dur_mismatch=0,
        )
        t, labels = generate_clips_table(2000, dup_cfg, with_labels=True)
        ids = t["clip_id"].to_pylist()
        bufs = t["bytes"].to_pylist()
        seen = {}
        dup_checked = 0
        for i, cid in enumerate(ids):
            if cid in seen:
                assert bufs[i] == bufs[seen[cid]]
                dup_checked += 1
            else:
                seen[cid] = i
        assert dup_checked > 0


class TestClipValidator:
    def test_clean_table_all_ok(self):
        clean = ClipsConfig(
            rate_dup=0, rate_corrupt=0, rate_ref_transcript_on_bad=0,
            rate_ref_null_on_good=0, rate_snr=0, rate_transcript_mismatch=0,
            rate_sr_invalid=0, rate_dur_mismatch=0,
        )
        t = generate_clips_table(50, clean)
        out = ClipValidator()(t)
        assert all(out["ok"].to_pylist())
        assert all(out["decodable"].to_pylist())

    def test_violations_match_ground_truth(self):
        t, labels = generate_clips_table(500, CFG, with_labels=True)
        out = ClipValidator()(t)
        actual = out["violations"].to_pylist()
        for i, expected in enumerate(labels):
            exp = set(k for k in expected if k != "duplicate_clip_id")
            assert set(actual[i]) == exp, f"row {i}: {exp} != {set(actual[i])}"

    def test_strict_codecs_stub(self):
        t = generate_clips_table(40, CFG)
        out = ClipValidator(strict_codecs=True)(t)
        codecs = out["codec"].to_pylist()
        dec = out["decodable"].to_pylist()
        # non-pcm codecs route to the NotImplementedError stub → undecodable
        assert not any(d for c, d in zip(codecs, dec) if c != "pcm_s16le")
        assert any(d for c, d in zip(codecs, dec) if c == "pcm_s16le")


class TestSpeechRateCheck:
    """Opt-in transcript speech-rate band (chars/sec vs dur_ms)."""

    def _batch(self, clip_id, dur_ms, transcript):
        import pyarrow as pa

        from schema_guru_ray.audio import synth
        from schema_guru_ray.audio.wav import encode_wav

        sr = 16000
        n = int(sr * dur_ms / 1000)
        pcm = synth.reference_pcm(clip_id, sr, n)
        return pa.table(
            {
                "clip_id": [clip_id],
                "bytes": [encode_wav(pcm, sr)],
                "sr_hz": pa.array([sr], pa.int32()),
                "dur_ms": pa.array([dur_ms], pa.int32()),
                "codec": ["pcm_s16le"],
                "transcript": [transcript],
            }
        )

    def test_flags_only_out_of_band(self):
        from schema_guru_ray.stages.audio import ClipValidator

        v = ClipValidator(check_transcript=False, rate_bounds_cps=(1.0, 50.0))
        # 1000 ms with 20 chars → 20 cps: in band
        ok = v(self._batch("clip-a", 1000, "x" * 20))
        assert "speech_rate_out_of_range" not in ok["violations"][0].as_py()
        # 100 ms with 200 chars → 2000 cps: flagged
        bad = v(self._batch("clip-b", 100, "x" * 200))
        assert "speech_rate_out_of_range" in bad["violations"][0].as_py()
        # default validator: check disabled
        off = ClipValidator(check_transcript=False)(self._batch("clip-c", 100, "x" * 200))
        assert "speech_rate_out_of_range" not in off["violations"][0].as_py()
