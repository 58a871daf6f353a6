"""Energy segmentation (VAD) + resample/normalize: ground-truth boundary
checks on synthesized tone/silence layouts, signal-preservation properties,
and the Ray stage plumbing over a real clips table."""

import numpy as np
import pandas as pd
import pytest

from schema_guru_ray.audio.wav import decode_wav, encode_wav
from schema_guru_ray.stages.audio_transform import (
    energy_segments,
    frame_rms_db,
    normalize_rms,
    resample_pcm,
)

SR = 16000


def tone(dur_s, freq=440.0, amp=0.25, sr=SR):
    t = np.arange(int(dur_s * sr)) / sr
    return (amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def silence(dur_s, sr=SR):
    return np.zeros(int(dur_s * sr), dtype=np.int16)


class TestEnergySegments:
    def test_two_segments_known_boundaries(self):
        pcm = np.concatenate(
            [silence(0.25), tone(0.4), silence(0.3), tone(0.3), silence(0.2)]
        )
        segs = energy_segments(pcm, SR)
        assert len(segs) == 2
        (s0, e0, db0), (s1, e1, db1) = segs
        # boundaries within ±1 frame (20 ms) + rounding
        assert abs(s0 - 250) <= 25 and abs(e0 - 650) <= 25
        assert abs(s1 - 950) <= 25 and abs(e1 - 1250) <= 25
        # -0.25 amp sine: RMS = 0.25/sqrt(2) -> about -15 dBFS
        for db in (db0, db1):
            assert -17.0 < db < -13.0

    def test_gap_bridging_hysteresis(self):
        # 100 ms internal pause < max_gap 150 ms -> ONE segment
        pcm = np.concatenate([tone(0.3), silence(0.10), tone(0.3)])
        segs = energy_segments(pcm, SR)
        assert len(segs) == 1
        # 300 ms pause > max_gap -> two
        pcm2 = np.concatenate([tone(0.3), silence(0.30), tone(0.3)])
        assert len(energy_segments(pcm2, SR)) == 2

    def test_min_segment_drop_and_silence(self):
        blip = np.concatenate([silence(0.3), tone(0.05), silence(0.3)])
        assert energy_segments(blip, SR) == []  # 50 ms < min_seg 100 ms
        assert energy_segments(silence(1.0), SR) == []
        assert energy_segments(np.zeros(0, dtype=np.int16), SR) == []

    def test_frame_rms_db_levels(self):
        db = frame_rms_db(tone(0.5, amp=0.5), SR)
        # 0.5 amp sine -> RMS 0.3536 -> about -9 dBFS
        assert np.all(np.abs(db[:-1] + 9.0) < 1.0)
        assert frame_rms_db(silence(0.1), SR).max() <= -100.0


class TestResampleNormalize:
    def test_resample_preserves_duration_and_frequency(self):
        pcm = tone(0.5, freq=440.0, sr=8000)
        out = resample_pcm(pcm, 8000, 16000)
        assert len(out) == 2 * len(pcm)
        # frequency preserved: count sign changes about 2*f*dur
        crossings = int(np.sum(np.abs(np.diff(np.signbit(out.astype(np.int32))))))
        assert abs(crossings - 2 * 440 * 0.5) <= 10
        # downsample round-trip keeps correlation with the original high
        back = resample_pcm(out, 16000, 8000)
        a = pcm.astype(np.float64)
        b = back[: len(pcm)].astype(np.float64)
        corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert corr > 0.999

    def test_resample_identity_and_empty(self):
        pcm = tone(0.1)
        assert np.array_equal(resample_pcm(pcm, SR, SR), pcm)
        assert len(resample_pcm(np.zeros(0, dtype=np.int16), 8000, 16000)) == 0

    def test_normalize_hits_target(self):
        quiet = tone(0.4, amp=0.05)
        out = normalize_rms(quiet, -20.0)
        x = out.astype(np.float64) / 32768.0
        rms_db = 20 * np.log10(np.sqrt(np.square(x).mean()))
        assert abs(rms_db + 20.0) < 0.5

    def test_normalize_never_clips(self):
        # crest-heavy signal: target would push the peak over full scale
        spiky = (np.r_[np.zeros(4000), [0.9], np.zeros(4000)] * 32767).astype(np.int16)
        out = normalize_rms(spiky, -3.0)
        assert np.abs(out.astype(np.int32)).max() <= 32767
        assert normalize_rms(silence(0.1), -20.0).sum() == 0  # silent unchanged


@pytest.mark.usefixtures("ray_session")
class TestStages:
    def _clips_ds(self):
        import ray.data as rd

        rows = []
        layouts = {
            "a": [silence(0.2), tone(0.4), silence(0.2)],
            "b": [tone(0.3), silence(0.3), tone(0.3)],
            "c": [silence(0.8)],
        }
        for cid, parts in layouts.items():
            pcm = np.concatenate(parts)
            rows.append(
                {
                    "clip_id": cid,
                    "bytes": encode_wav(pcm, SR),
                    "sr_hz": SR,
                    "dur_ms": int(round(len(pcm) / SR * 1000)),
                    "codec": "pcm_s16le",
                    "transcript": "t",
                }
            )
        # one undecodable clip must be skipped, not crash
        rows.append(
            {"clip_id": "bad", "bytes": b"nope", "sr_hz": 8000, "dur_ms": 10,
             "codec": "pcm_s16le", "transcript": None}
        )
        return rd.from_pandas(pd.DataFrame(rows))

    def test_segment_clips_stage(self):
        from schema_guru_ray.stages.audio_transform import segment_clips

        out = segment_clips(self._clips_ds()).to_pandas()
        by_clip = out.groupby("clip_id").size().to_dict()
        assert by_clip == {"a": 1, "b": 2}  # c silent, bad undecodable
        a = out[out["clip_id"] == "a"].iloc[0]
        assert abs(a["start_ms"] - 200) <= 25 and abs(a["end_ms"] - 600) <= 25
        assert list(out.columns) == [
            "clip_id", "seg_idx", "start_ms", "end_ms", "rms_db"
        ]

    def test_resample_clips_stage_keeps_table_shape(self):
        from schema_guru_ray.stages.audio_transform import resample_clips

        out = resample_clips(self._clips_ds(), sr_out=8000).to_pandas()
        assert len(out) == 4
        ok = out[out["clip_id"] != "bad"]
        assert (ok["sr_hz"] == 8000).all()
        for _, r in ok.iterrows():
            pcm, sr = decode_wav(r["bytes"])
            assert sr == 8000
            assert abs(round(len(pcm) / sr * 1000) - r["dur_ms"]) <= 1
        bad = out[out["clip_id"] == "bad"].iloc[0]
        assert bad["bytes"] == b"nope" and bad["sr_hz"] == 8000  # passthrough

    def test_window_clips_layout_and_rms(self):
        from schema_guru_ray.stages.audio_transform import (
            window_clips, window_layout,
        )

        out = window_clips(
            self._clips_ds(), window_ms=250, hop_ms=100
        ).to_pandas()
        # exact layout ground truth: n = (dur - win)//hop + 1 windows per
        # decodable clip ('a'/'c' 800 ms, 'b' 900 ms; silence decodes fine)
        win, hop = int(SR * 0.25), int(SR * 0.10)

        def n_for(dur_s):
            return (int(dur_s * SR) - win) // hop + 1

        by_clip = out.groupby("clip_id").size().to_dict()
        assert by_clip == {"a": n_for(0.8), "b": n_for(0.9), "c": n_for(0.8)}
        n_expected = n_for(0.8)
        a = out[out["clip_id"] == "a"].sort_values("win_idx")
        assert a["win_idx"].tolist() == list(range(n_expected))
        assert a["start_ms"].tolist() == [100 * i for i in range(n_expected)]
        assert (a["end_ms"] - a["start_ms"] == 250).all()
        # cumsum RMS must equal direct per-window RMS; windows fully inside
        # the tone of clip 'a' (200-600 ms) sit at the sine's RMS level
        pcm = np.concatenate([silence(0.2), tone(0.4), silence(0.2)])
        starts, w = window_layout(len(pcm), SR, 250, 100)
        # direct per-window RMS in the kernel's own arithmetic (float32
        # samples, float64 mean accumulator — round 5) must match the
        # cumsum path to float rounding; pure float64 agrees to ~1e-6 dB
        x32 = pcm.astype(np.float32) / np.float32(32768.0)
        x64 = pcm.astype(np.float64) / 32768.0
        for _, r in a.iterrows():
            s = starts[int(r["win_idx"])]
            direct = 10.0 * np.log10(
                max(float(np.square(x32[s : s + w]).mean(dtype=np.float64)), 1e-12)
            )
            assert abs(direct - r["rms_db"]) < 1e-7
            direct64 = 10.0 * np.log10(
                max(float(np.square(x64[s : s + w]).mean()), 1e-12)
            )
            assert abs(direct64 - r["rms_db"]) < 1e-5
        full_tone = a[(a["start_ms"] >= 200) & (a["end_ms"] <= 600)]
        assert len(full_tone) >= 1
        assert ((full_tone["rms_db"] > -17) & (full_tone["rms_db"] < -13)).all()
        # silent clip floors at -120 dB
        assert (out[out["clip_id"] == "c"]["rms_db"] == -120.0).all()

    def test_window_clips_emit_bytes_roundtrip(self):
        from schema_guru_ray.stages.audio_transform import window_clips

        out = window_clips(
            self._clips_ds(), window_ms=250, hop_ms=250, emit_bytes=True
        ).to_pandas()
        assert "bytes" in out.columns and len(out) > 0
        for _, r in out.iterrows():
            pcm, sr = decode_wav(r["bytes"])
            assert sr == SR and len(pcm) == int(SR * 0.25)

    def test_window_layout_short_clip_yields_nothing(self):
        from schema_guru_ray.stages.audio_transform import window_layout

        starts, _ = window_layout(int(SR * 0.1), SR, 250, 100)
        assert len(starts) == 0


class TestAugmentation:
    """Speed perturbation + noise mixing: analytic ground truth on
    synthesized tones, determinism, and the invariant queries' plumbing."""

    def test_speed_perturb_length_and_content(self):
        from schema_guru_ray.stages.audio_transform import speed_perturb_pcm

        x = tone(1.0)
        for f in (0.9, 1.1):
            y = speed_perturb_pcm(x, SR, f)
            assert len(y) == int(round(len(x) / f))
            # independent expectation: linear interp at the output stride
            ref = np.interp(
                np.arange(len(y), dtype=np.float64) * (SR / int(round(SR / f))),
                np.arange(len(x), dtype=np.float64), x.astype(np.float64),
            )
            assert np.abs(y.astype(np.float64) - ref).max() <= 1.0
        assert np.array_equal(speed_perturb_pcm(x, SR, 1.0), x)

    def test_noise_mix_hits_target_snr_and_is_deterministic(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from schema_guru_ray.stages.audio_transform import NoiseMixer

        x = tone(1.0, amp=0.25)
        tab = pa.table({
            "clip_id": ["clip-a", "clip-b"],
            "bytes": [encode_wav(x, SR), encode_wav(tone(0.5, 220.0), SR)],
            "sr_hz": pa.array([SR, SR], pa.int32()),
            "dur_ms": pa.array([1000, 500], pa.int32()),
            "codec": ["pcm_s16le", "pcm_s16le"],
            "transcript": ["t", "t"],
        })
        m = NoiseMixer(snr_db=20.0)
        out1, out2 = m(tab), m(tab)
        assert out1["bytes"].to_pylist() == out2["bytes"].to_pylist()  # deterministic
        ach = np.array(out1["achieved_snr_centi"].to_pylist()) / 100.0
        assert np.abs(ach - 20.0).max() < 0.5
        # measured independently from the emitted bytes
        y, _ = decode_wav(out1["bytes"][0].as_py())
        added = y.astype(np.float64) - x.astype(np.float64)
        snr = 10 * np.log10((x.astype(np.float64) ** 2).mean() / (added ** 2).mean())
        assert abs(snr - 20.0) < 0.5
        # distinct clips get distinct noise
        z, _ = decode_wav(out1["bytes"][1].as_py())
        assert not np.array_equal(y[: len(z)], z)

    def test_invariant_queries(self, ray_session):
        from schema_guru_ray.pipelines.queries import QUERIES
        from schema_guru_ray.sources.clips import ensure_clips
        import pyarrow.parquet as pq

        sf = "/root/testdata/sf0.001"
        n_dec = None
        # ground truth: decodable count from the generator's own table
        tab = pq.read_table(ensure_clips(sf))
        from schema_guru_ray.audio.wav import WavDecodeError

        def dec_ok(b):
            try:
                decode_wav(b)
                return True
            except (WavDecodeError, TypeError):
                return False

        n_dec = sum(dec_ok(b) for b in tab["bytes"].to_pylist())

        sp = QUERIES["clips_speed_perturb"](sf).to_pandas().sort_values("speed_factor")
        assert list(sp["speed_factor"]) == [0.9, 1.1]
        assert (sp["n"] == n_dec).all()
        assert (sp["max_drift_ms"] <= 1).all()

        nm = QUERIES["clips_noise_mix"](sf).to_pandas()
        assert nm["n"].sum() <= n_dec  # all-silent clips are skipped
        assert nm["n"].sum() > 0
        assert (nm["min_snr_centi"] >= 1950).all()
        assert (nm["max_snr_centi"] <= 2050).all()

    def test_speed_perturb_drift_with_corrupt_dur_metadata(self, ray_session):
        """src_dur_ms must come from the DECODED waveform: a clip whose
        dur_ms metadata is wrong by 500 ms still satisfies the
        round(src/f) ± 1 ms invariant (round-4 review regression)."""
        import pyarrow as pa
        import ray.data as rd

        from schema_guru_ray.stages.audio_transform import speed_perturb_clips

        x = tone(1.0)
        tab = pa.table({
            "clip_id": ["bad-dur"],
            "bytes": [encode_wav(x, SR)],
            "sr_hz": pa.array([SR], pa.int32()),
            "dur_ms": pa.array([1500], pa.int32()),  # actually 1000 ms
            "codec": ["pcm_s16le"],
            "transcript": ["t"],
        })
        out = speed_perturb_clips(rd.from_arrow(tab)).to_pandas()
        assert (out["src_dur_ms"] == 1000).all()
        exp = np.floor(out["src_dur_ms"] / out["speed_factor"] + 0.5)
        assert (np.abs(out["dur_ms"] - exp) <= 1).all()

    def test_shingle_combine_supports_wide_windows(self):
        """n-gram kernels must support n > 8 (8-13-gram decontamination
        deployments) — indexing the fixed 8-constant array crashed."""
        import pandas as pd

        from schema_guru_ray.stages.contamination import (
            gram_window_hashes, hash_gram_strings,
        )
        from schema_guru_ray.stages.dedup import shingle_combine

        assert len(hash_gram_strings(["a b c d e f g h i j k l m"], 13)) == 1
        d, g = gram_window_hashes(
            pd.Series(["one two three four five six seven eight nine ten"]), 9
        )
        assert len(g) == 2
        # first 8 constants unchanged (hash stability with every oracle)
        from schema_guru_ray.stages.dedup import SHINGLE_COMBINE

        assert np.array_equal(shingle_combine(8), SHINGLE_COMBINE)
        assert len(shingle_combine(13)) == 13
        assert (shingle_combine(13)[8:] % 2 == 1).all()  # odd multipliers
