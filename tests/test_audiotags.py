"""Audio tag metadata (mycelium_ray/audiotags.py): FLAC VORBIS_COMMENT
and MP3 ID3v2 set/get/strip round trips, decode/probe neutrality, v2.3
compatibility, honest errors. The audio_tags pipeline key is covered by
the oracle parametrization in test_queries.py."""

import struct

import numpy as np
import pytest

from mycelium_ray.audiometa import probe_audio, write_mp3_skeleton
from mycelium_ray.audiotags import (AudioTagError, flac_get_tags,
                                    flac_set_tags, flac_strip_tags,
                                    id3_build, id3_parse, mp3_get_tags,
                                    mp3_set_tags, mp3_strip_tags)
from mycelium_ray.flac import decode_flac, encode_flac


@pytest.fixture(scope="module")
def flac_clip():
    t = np.rint(9000 * np.sin(2 * np.pi * 330 * np.arange(4000) / 8000)) \
        .astype(np.int16)
    return encode_flac(t, 8000)


def test_flac_tag_lifecycle(flac_clip):
    tagged = flac_set_tags(flac_clip, {"title": "Song ☃", "ARTIST": "A"})
    assert flac_get_tags(tagged) == {"TITLE": "Song ☃", "ARTIST": "A"}
    # decode- and probe-neutral
    assert np.array_equal(decode_flac(tagged)[2], decode_flac(flac_clip)[2])
    assert probe_audio(tagged).sample_rate == 8000
    # strip restores the exact original bytes
    assert flac_strip_tags(tagged) == flac_clip
    assert flac_get_tags(flac_clip) == {}


def test_flac_retag_replaces(flac_clip):
    t1 = flac_set_tags(flac_clip, {"TITLE": "One"})
    t2 = flac_set_tags(t1, {"TITLE": "Two"})
    assert flac_get_tags(t2) == {"TITLE": "Two"}
    assert flac_strip_tags(t2) == flac_clip


def test_flac_bad_key_and_garbage(flac_clip):
    with pytest.raises(AudioTagError):
        flac_set_tags(flac_clip, {"BAD=KEY": "x"})
    with pytest.raises(AudioTagError):
        flac_get_tags(b"not flac at all")


def test_mp3_tag_lifecycle():
    mp = write_mp3_skeleton(44100, 128, 6)
    m = mp3_set_tags(mp, {"TIT2": "Hello ☃", "TPE1": "Artist"})
    assert mp3_get_tags(m) == {"TIT2": "Hello ☃", "TPE1": "Artist"}
    assert probe_audio(m).sample_rate == 44100   # ID3 skip path
    assert mp3_strip_tags(m) == mp
    assert mp3_get_tags(mp) == {}
    m2 = mp3_set_tags(m, {"TIT2": "Other"})
    assert mp3_get_tags(m2) == {"TIT2": "Other"}
    assert mp3_strip_tags(m2) == mp


def test_id3_v23_nonsyncsafe_sizes():
    payload = b"\x00Latin"
    fr = b"TIT2" + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    n = len(fr)
    v23 = b"ID3\x03\x00\x00" + bytes([(n >> 21) & 127, (n >> 14) & 127,
                                      (n >> 7) & 127, n & 127]) + fr
    assert id3_parse(v23) == {"TIT2": "Latin"}


def test_id3_utf16_and_padding():
    text = "Héllo".encode("utf-16")   # with BOM
    payload = b"\x01" + text
    body = b"TIT2" + bytes([0, 0, 0, len(payload)]) + b"\x00\x00" + payload
    body += b"\x00" * 12   # padding after the last frame
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, len(body)]) + body
    assert id3_parse(tag) == {"TIT2": "Héllo"}


def test_id3_build_rejects_bad_frame_id():
    with pytest.raises(AudioTagError):
        id3_build({"TOOLONGID": "x"})
