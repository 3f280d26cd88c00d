"""Reference OmegaConf-YAML config ingestion: a user's training.yaml /
testing.yaml (`/root/reference/configs/*.yaml` schema) must map onto the
typed configs, and intentionally-unreplicated settings must raise."""

import dataclasses
import textwrap

import pytest

from rcdms_tpu.configs import PriorConfig, StoryUNetConfig
from rcdms_tpu.configs.reference_yaml import (
    UnsupportedReferenceConfig,
    apply_to_unet_config,
    parse_reference_yaml,
)

TRAINING_YAML = textwrap.dedent("""\
    unet_additional_kwargs:
      use_motion_module              : true
      motion_module_resolutions      : [ 1,2,4,8 ]
      unet_use_cross_frame_attention : false
      unet_use_temporal_attention    : false
      motion_module_type: Vanilla
      motion_module_kwargs:
        num_attention_heads                : 8
        num_transformer_block              : 1
        attention_block_types              : [ "Temporal_Self", "Temporal_Self" ]
        temporal_position_encoding         : true
        temporal_position_encoding_max_len : 5
        temporal_attention_dim_div         : 1
        zero_initialize                    : true
""")

TESTING_TAIL = textwrap.dedent("""\

    noise_scheduler_kwargs:
      beta_start: 0.00085
      beta_end: 0.012
      beta_schedule: "linear"
""")


def _write(tmp_path, text, name="cfg.yaml"):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_training_yaml_maps_to_temporal_config(tmp_path):
    overrides, sched = parse_reference_yaml(_write(tmp_path, TRAINING_YAML))
    assert sched is None
    assert overrides["use_temporal"] is True
    t = overrides["temporal"]
    assert (t.num_heads, t.num_blocks, t.attn_layers_per_block) == (8, 1, 2)
    assert t.use_positional_encoding and t.zero_init_output
    assert t.max_frames == 5

    # applies to both model configs (replace-only-known-fields)
    ucfg = apply_to_unet_config(StoryUNetConfig(), overrides)
    pcfg = apply_to_unet_config(PriorConfig(), overrides)
    assert ucfg.temporal == t and pcfg.temporal == t
    # nothing else changed
    assert dataclasses.replace(ucfg, temporal=StoryUNetConfig().temporal,
                               use_temporal=True) == StoryUNetConfig()


def test_testing_yaml_builds_ddim_schedule(tmp_path):
    _, sched = parse_reference_yaml(
        _write(tmp_path, TRAINING_YAML + TESTING_TAIL))
    assert sched is not None
    assert sched.beta_schedule == "linear"
    assert sched.beta_start == pytest.approx(0.00085)
    assert sched.beta_end == pytest.approx(0.012)
    # identical to the built-in stage-2 inference schedule
    from rcdms_tpu.core.schedulers import DDIMSchedule

    assert sched == DDIMSchedule.stage2_inference()


def test_yaml_motion_off(tmp_path):
    overrides, _ = parse_reference_yaml(_write(
        tmp_path, "unet_additional_kwargs:\n  use_motion_module: false\n"))
    assert overrides == {"use_temporal": False}


@pytest.mark.parametrize("patch,match", [
    ("unet_use_cross_frame_attention : false",
     None),  # control: valid
    ("unet_use_cross_frame_attention : true", "SparseCausal"),
    ("unet_use_temporal_attention    : true", None),  # replaced below
])
def test_yaml_valid_controls(tmp_path, patch, match):
    if patch.startswith("unet_use_temporal_attention"):
        text = TRAINING_YAML.replace(
            "unet_use_temporal_attention    : false", patch, 1)
        with pytest.raises(UnsupportedReferenceConfig,
                           match="unet_use_temporal_attention"):
            parse_reference_yaml(_write(tmp_path, text))
        return
    text = TRAINING_YAML.replace(
        "unet_use_cross_frame_attention : false", patch, 1)
    if match is None:
        parse_reference_yaml(_write(tmp_path, text))
    else:
        with pytest.raises(UnsupportedReferenceConfig, match=match):
            parse_reference_yaml(_write(tmp_path, text))


@pytest.mark.parametrize("find,repl,match", [
    ("motion_module_type: Vanilla", "motion_module_type: Fancy",
     "Vanilla"),
    ("[ 1,2,4,8 ]", "[ 1,2 ]", "resolutions"),
    ("temporal_attention_dim_div         : 1",
     "temporal_attention_dim_div         : 2", "dim_div"),
    ('[ "Temporal_Self", "Temporal_Self" ]',
     '[ "Temporal_Cross", "Temporal_Self" ]', "Temporal_Self"),
])
def test_yaml_unsupported_settings_raise(tmp_path, find, repl, match):
    with pytest.raises(UnsupportedReferenceConfig, match=match):
        parse_reference_yaml(_write(tmp_path,
                                    TRAINING_YAML.replace(find, repl, 1)))


@pytest.mark.slow
def test_evaluate_cli_accepts_reference_yaml(tmp_path):
    from rcdms_tpu.cli.evaluate import main

    cfg = _write(tmp_path, TRAINING_YAML + TESTING_TAIL)
    out = str(tmp_path / "out")
    main(["--synthetic", "--mode", "continue", "--output-dir", out,
          "--num-stories", "1", "--num-inference-steps", "2",
          "--config", cfg])
    import os

    assert os.path.exists(os.path.join(out, "summary_0.json"))
