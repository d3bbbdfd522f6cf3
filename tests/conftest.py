"""Test env: force an 8-device virtual CPU mesh so sharding paths compile
without TPU hardware (mirrors the driver's multi-chip dry-run).

NOTE: this image force-registers the tunneled TPU backend via
sitecustomize (JAX_PLATFORMS=axon); the TPU is a single-claim resource,
so tests MUST run on CPU — override both the env var and the live
config.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's cost is single-core
# compiles of detector graphs (16 min cold); warm reruns skip them.
_cache_dir = os.environ.get(
    "NSGP_TEST_COMPILE_CACHE", "/root/.cache/nsgp_jax_test_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# synthetic VOC fixture (shared by test_data_eval / test_teacher_cache)
# ---------------------------------------------------------------------------

VOC_XML = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""
OBJ_XML = """<object>
    <name>{cls}</name><difficult>{diff}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("VOCdevkit")
    base = root / "VOC2007"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "Annotations").mkdir()
    (base / "ImageSets" / "Main").mkdir(parents=True)
    rng = np.random.RandomState(0)
    from nsgp_repre_tpu.datasets.voc import VOC_CLASSES

    ids = []
    for i in range(6):
        name = f"{i:06d}"
        w, h = (80, 60) if i % 2 == 0 else (60, 80)
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(base / "JPEGImages" / f"{name}.jpg"), img)
        objects = []
        # image i gets classes i%20 and (i+15)%20
        for cls_idx in (i % 20, (i + 15) % 20):
            objects.append(
                OBJ_XML.format(
                    cls=VOC_CLASSES[cls_idx], diff=0,
                    x1=5 + cls_idx % 3, y1=5, x2=40, y2=40,
                )
            )
        xml = VOC_XML.format(name=name, w=w, h=h, objects="\n".join(objects))
        (base / "Annotations" / f"{name}.xml").write_text(xml)
        ids.append(name)
    (base / "ImageSets" / "Main" / "trainval.txt").write_text("\n".join(ids))
    (base / "ImageSets" / "Main" / "test.txt").write_text("\n".join(ids))
    return str(root)
