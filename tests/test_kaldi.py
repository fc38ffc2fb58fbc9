"""Kaldi data-dir utilities (`data/kaldi.py`) — behavior pinned to the
reference's kaldi-utils semantics (`tools/kaldi/utils/**`)."""

import os

import pytest

from uniaudio2_tpu.data import kaldi


def _mk_dir(tmp_path, n_utts=6, n_spk=2, name="data"):
    d = tmp_path / name
    d.mkdir()
    utts = [f"spk{i % n_spk}-utt{i:02d}" for i in range(n_utts)]
    kaldi.write_scp(str(d / "wav.scp"), {u: f"/wav/{u}.wav" for u in utts})
    kaldi.write_scp(str(d / "text"), {u: f"hello {i}" for i, u in enumerate(utts)})
    u2s = {u: u.split("-")[0] for u in utts}
    kaldi.write_scp(str(d / "utt2spk"), u2s)
    kaldi.write_scp(str(d / "spk2utt"), kaldi.utt2spk_to_spk2utt(u2s))
    return str(d), utts


def test_scp_roundtrip_and_filter(tmp_path):
    p = str(tmp_path / "a.scp")
    kaldi.write_scp(p, {"b": "2", "a": "1 x", "c": ""})
    t = kaldi.read_scp(p)
    assert list(t) == ["a", "b", "c"] and t["a"] == "1 x" and t["c"] == ""
    assert kaldi.filter_scp(["a", "c"], t) == {"a": "1 x", "c": ""}
    assert kaldi.filter_scp(["a", "c"], t, exclude=True) == {"b": "2"}


def test_apply_map():
    t = {"u1": "the cat", "u2": "cat"}
    m = {"the": "1", "cat": "2"}
    assert kaldi.apply_map(t, m) == {"u1": "1 2", "u2": "2"}
    with pytest.raises(KeyError):
        kaldi.apply_map({"u": "dog"}, m)
    assert kaldi.apply_map({"u": "dog"}, m, permissive=True) == {"u": "dog"}


def test_utt_spk_roundtrip():
    u2s = {"s1-a": "s1", "s1-b": "s1", "s2-a": "s2"}
    s2u = kaldi.utt2spk_to_spk2utt(u2s)
    assert s2u == {"s1": "s1-a s1-b", "s2": "s2-a"}
    assert kaldi.spk2utt_to_utt2spk(s2u) == u2s


def test_split_scp_even_and_speaker_preserving():
    t = {f"u{i:02d}": str(i) for i in range(10)}
    parts = kaldi.split_scp(t, 3)
    assert [len(p) for p in parts] == [3, 4, 3]
    assert {k for p in parts for k in p} == set(t)
    # speaker-preserving: 2 speakers x 5 utts, n=2 -> no speaker straddles
    u2s = {k: ("a" if i < 5 else "b") for i, k in enumerate(sorted(t))}
    parts = kaldi.split_scp(t, 2, utt2spk=u2s)
    for p in parts:
        assert len({u2s[k] for k in p}) == 1


def test_fix_and_validate(tmp_path):
    d, utts = _mk_dir(tmp_path)
    # break it: drop an utt from text only, unsort wav.scp
    text = kaldi.read_scp(os.path.join(d, "text"))
    text.pop(utts[0])
    kaldi.write_scp(os.path.join(d, "text"), text)
    assert kaldi.validate_data_dir(d)  # inconsistent now
    kaldi.fix_data_dir(d)
    assert kaldi.validate_data_dir(d) == []
    wav = kaldi.read_scp(os.path.join(d, "wav.scp"))
    assert utts[0] not in wav and len(wav) == len(utts) - 1


def test_copy_combine_subset(tmp_path):
    d1, utts = _mk_dir(tmp_path, name="d1")
    d2 = str(tmp_path / "d2")
    kaldi.copy_data_dir(d1, d2, utt_prefix="x-", spk_prefix="x-")
    assert kaldi.validate_data_dir(d2) == []
    assert all(u.startswith("x-") for u in kaldi.read_scp(
        os.path.join(d2, "wav.scp")))
    comb = str(tmp_path / "comb")
    kaldi.combine_data(comb, [d1, d2])
    assert len(kaldi.read_scp(os.path.join(comb, "wav.scp"))) == 2 * len(utts)
    assert kaldi.validate_data_dir(comb) == []
    with pytest.raises(ValueError):
        kaldi.combine_data(str(tmp_path / "dup"), [d1, d1])
    sub = str(tmp_path / "sub")
    kaldi.subset_data_dir(comb, sub, per_spk=1)
    u2s = kaldi.read_scp(os.path.join(sub, "utt2spk"))
    assert sorted(set(u2s.values())) == sorted(u2s.values())  # 1 utt/spk
    assert kaldi.validate_data_dir(sub) == []


def test_remove_dup_utts(tmp_path):
    d, utts = _mk_dir(tmp_path)
    text = {u: "same same" for u in utts}
    kaldi.write_scp(os.path.join(d, "text"), text)
    removed = kaldi.remove_dup_utts(d, max_count=2)
    assert removed == len(utts) - 2
    assert kaldi.validate_data_dir(d) == []


def test_split_data_dir(tmp_path):
    d, utts = _mk_dir(tmp_path, n_utts=8, n_spk=4)
    subs = kaldi.split_data_dir(d, 2)
    assert len(subs) == 2
    tot = 0
    for s in subs:
        assert kaldi.validate_data_dir(s) == []
        tot += len(kaldi.read_scp(os.path.join(s, "wav.scp")))
    assert tot == len(utts)


def test_cli_roundtrip(tmp_path, capsys):
    d, utts = _mk_dir(tmp_path)
    assert kaldi.main(["validate_data_dir", d]) == 0
    ids = str(tmp_path / "ids")
    kaldi.write_scp(ids, {utts[0]: "", utts[1]: ""})
    kaldi.main(["filter_scp", ids, os.path.join(d, "wav.scp")])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2 and out[0].startswith(utts[0])
