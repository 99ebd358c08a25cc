"""Benchmark harness: cfg parsing, grammar output, end-to-end sequence run."""

import io
import re

import jax
import numpy as np

from vk_gaussian_splatting_tpu.bench.sequencer import (
    BenchmarkSequencer,
    parse_sequence_file,
)
from vk_gaussian_splatting_tpu.scene.cameras import look_at
from vk_gaussian_splatting_tpu.scene.splat_set import random_splats
from vk_gaussian_splatting_tpu.utils.memstats import MemoryStatistics
from vk_gaussian_splatting_tpu.utils.profiling import FrameTimers


def test_parse_reference_cfg():
    """Our parser must handle the reference's own cfg files verbatim."""
    blocks = parse_sequence_file("/root/reference/benchmark_3dgs.cfg")
    assert blocks[0][0] == "Load scene and common settings"
    assert blocks[0][1]["sequenceframes"] == "1024"
    names = [b[0] for b in blocks]
    assert "Mesh pipeline fp16" in names
    mesh16 = dict(blocks)[("Mesh pipeline fp16")]
    assert mesh16["pipeline"] == "1" and mesh16["shformat"] == "1"
    assert "updateData" in mesh16

    rt = parse_sequence_file("/root/reference/benchmark_3dgrt.cfg")
    kd = [b for _, b in rt if "kernelDegree" in b]
    assert kd and kd[0]["kernelDegree"] == "4"  # comment stripped


def test_timer_grammar_parsable_by_reference_regex():
    timers = FrameTimers()
    timers.add("GPU Dist", 0.00123)
    timers.add("Rasterization", 0.01)
    buf = io.StringIO()
    timers.print_timers(out=lambda s: buf.write(s + "\n"))
    text = buf.getvalue()
    pat = re.compile(
        r'Timer\s+"([^"]+)"\s*;\s*GPU;\s*avg\s+(\d+);.*?CPU;\s*avg\s+(\d+);')
    found = {m.group(1): int(m.group(2)) for m in pat.finditer(text)}
    assert found["GPU Dist"] == 1230
    assert found["Rasterization"] == 10000


def test_benchmark_adv_grammar():
    ms = MemoryStatistics()
    ms.set("Scene", host_used=100, device_used=200)
    buf = io.StringIO()
    ms.print_benchmark_adv(3, out=lambda s: buf.write(s + "\n"))
    text = buf.getvalue()
    assert re.search(r"BENCHMARK_ADV 3 {", text)
    m = re.search(
        r"Memory (\w+); Host used\s+(\d+); Device Used\s+(\d+); "
        r"Device Allocated\s+(\d+);", text)
    assert m and m.group(1) == "Scene" and int(m.group(2)) == 100


def test_sequencer_end_to_end(tmp_path):
    cfg_file = tmp_path / "mini.cfg"
    cfg_file.write_text(
        'SEQUENCE "setup"\n'
        "--sequenceframes 2\n--sequenceaverages 1\n--maxShDegree 1\n\n"
        'SEQUENCE "gs fp16"\n--pipeline 1\n--shformat 1\n--updateData \n\n'
        'SEQUENCE "gut"\n--pipeline 4\n--shformat 0\n--updateData \n'
        f'--screenshot "{tmp_path}/shot.png"\n'
    )
    splats = random_splats(jax.random.key(0), 200, sh_degree=1,
                           scale_range=(-2.5, -1.2))
    cam = look_at([0, 0, -9], [0, 0, 0], [0, 1, 0], 64, 48)
    lines = []
    seq = BenchmarkSequencer(splats, 64, 48, cam, out=lambda s: lines.append(s),
                             max_pairs=32768)
    seq.run(parse_sequence_file(str(cfg_file)))
    text = "\n".join(lines)
    assert 'ParameterSequence 1 "gs fp16" =' in text
    assert re.search(r'Timer "Rasterization"; GPU; avg \d+;', text)
    assert re.search(r'Timer "GPU Sort"; GPU; avg \d+;', text)
    assert "BENCHMARK_ADV 2 {" in text
    import os
    assert (os.path.exists(tmp_path / "shot.png")
            or os.path.exists(str(tmp_path / "shot.png") + ".npy"))
