"""Config system tests (ParseOptions / --config=file role)."""

import pytest

from voicebridge_tpu.config import (FrameOptions, MfccOptions, TriTrainOptions,
                                    apply_conf, load_conf, parse_conf_lines)


class TestConf:
    def test_parse_lines(self):
        conf = parse_conf_lines([
            "--use-energy=false   # like the reference conf files",
            "",
            "--num-mel-bins=40",
            "--frame-length=20",
        ])
        assert conf == {"use-energy": "false", "num-mel-bins": "40",
                        "frame-length": "20"}

    def test_apply_to_dataclass(self):
        fo = apply_conf(FrameOptions(), {"frame-length-ms": "20",
                                         "dither": "0.0",
                                         "window-type": "hamming"})
        assert fo.frame_length_ms == 20.0
        assert fo.dither == 0.0
        assert fo.window_type == "hamming"
        assert fo.window_size == 320

    def test_unknown_keys_ignored_unless_strict(self):
        fo = apply_conf(FrameOptions(), {"nonexistent": "1"})
        assert fo == FrameOptions()
        with pytest.raises(KeyError):
            apply_conf(FrameOptions(), {"nonexistent": "1"}, strict=True)

    def test_bool_coercion(self):
        m = apply_conf(MfccOptions(), {"use-energy": "false"})
        assert m.use_energy is False
        m = apply_conf(MfccOptions(), {"use-energy": "true"})
        assert m.use_energy is True

    def test_conf_file_roundtrip(self, tmp_path):
        p = tmp_path / "train.conf"
        p.write_text("--num-iters=12\n--totgauss=512\n# comment\n")
        t = apply_conf(TriTrainOptions(), load_conf(p))
        assert t.num_iters == 12 and t.totgauss == 512
