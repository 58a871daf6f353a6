"""Audio plumbing: pure-numpy PCM16 WAV encode/decode + deterministic
reference-signal synthesis. No external audio libraries — the container has
none, and the north-star invariant (decoded-PCM allclose SNR>=30dB) only
needs PCM. Non-PCM codecs (flac/opus/mp3) are STUBBED: the ``codec`` column
is a routing/grouping label and their decode raises NotImplementedError
behind a clearly-marked gate (see stages/audio.py)."""
