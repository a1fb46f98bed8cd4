"""Frontend conversation library tests (ConvMeta / DataMeta semantics)."""

import numpy as np
from PIL import Image

from emu_tpu.serving.frontend import ConvMeta, DataMeta, Role


def test_grounding_fragment_and_mask():
    item = DataMeta.build(text="a cat", coordinate=(10, 20, 100, 200))
    frag = item.format_prompt()
    assert frag[0] == "<phrase>a cat</phrase>"
    assert frag[1] == "<object>" and frag[3] == "</object>"
    mask = np.asarray(frag[2])
    assert mask.shape == (448, 448, 3)
    assert mask[20, 10:100].max() == 255        # rectangle drawn
    assert mask[150, 150].max() == 0            # interior stays black


def test_coordinate_fix_clamps_and_orders():
    item = DataMeta.build(text="x", coordinate=(500, -3, 20, 100))
    assert item.coordinate == (20, 0, 448, 100)


def test_min_side_resize():
    big = Image.new("RGB", (896, 1792))
    out = DataMeta.resize(big)
    assert min(out.size) == 448
    small = Image.new("RGB", (100, 120))
    assert DataMeta.resize(small).size == (100, 120)


def test_format_chat_role_alternation():
    conv = ConvMeta()
    conv.append(Role.USER, DataMeta.build(text="hello"))
    conv.append(Role.ASSISTANT, DataMeta.build(text="hi"))
    conv.append(Role.USER, DataMeta.build(text="again"))
    parts = conv.format_chat()
    joined = "".join(p for p in parts if isinstance(p, str))
    assert joined.startswith(conv.system)
    assert " [USER]: hello" in joined
    assert " [ASSISTANT]: hi" in joined
    assert "</s>[USER]: again" in joined
    assert joined.endswith(" [ASSISTANT]:")


def test_format_prompt_prepends_grounding():
    conv = ConvMeta()
    conv.append(Role.USER, DataMeta.build(text="cat",
                                          coordinate=(1, 1, 50, 50)))
    parts = conv.format_prompt()
    assert parts[0] == "<grounding>"


def test_video_span_tokens():
    frames = [Image.new("RGB", (64, 64)) for _ in range(3)]
    item = DataMeta.build(frames=frames)
    frag = item.format_prompt()
    assert frag[0] == "[VIDEO]" and frag[-1] == "[/VIDEO]"
    assert len(frag) == 5
