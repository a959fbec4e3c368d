import numpy as np

from slotvps_tpu.eval.color import (
    CITYSCAPES_CATEGORIES, IdGenerator, id2rgb, rgb2id)


def test_rgb2id_roundtrip(rng):
    ids = rng.integers(0, 256 ** 3, size=(17, 23), dtype=np.uint32)
    assert np.array_equal(rgb2id(id2rgb(ids)), ids)


def test_rgb2id_uint8():
    rgb = np.array([[1, 2, 3]], dtype=np.uint8)
    assert rgb2id(rgb)[0] == 1 + 2 * 256 + 3 * 256 * 256


def test_id_generator_stuff_color_is_base():
    cats = {c["id"]: c for c in CITYSCAPES_CATEGORIES}
    gen = IdGenerator(cats)
    assert gen.get_color(10, -1) == tuple(cats[10]["color"])
    # stuff colors stable across calls
    assert gen.get_color(10, -1) == tuple(cats[10]["color"])


def test_id_generator_things_distinct_and_deterministic():
    cats = {c["id"]: c for c in CITYSCAPES_CATEGORIES}
    colors_a = []
    gen = IdGenerator(cats)
    for seq in range(50):
        colors_a.append(gen.get_color(13, seq))
    assert len(set(colors_a)) == 50  # all distinct
    # deterministic across independent generators
    gen2 = IdGenerator(cats)
    colors_b = [gen2.get_color(13, seq) for seq in range(50)]
    assert colors_a == colors_b
    # never collides with a stuff base color
    stuff_colors = {tuple(c["color"]) for c in CITYSCAPES_CATEGORIES
                    if not c["isthing"]}
    assert not stuff_colors.intersection(colors_a)
