"""Mechanical cross-check of OUR encoder registry against the REFERENCE's
own encoder tables (VERDICT r1 item 6 insurance against shared-
misconception twins): for every encoder name both registries know, the
out_channels tuple our modules advertise must equal the tuple in the
reference's `*_encoders` dicts (ref encoders/*.py "params": out_channels).

This is source-level verification, not a twin: the expected values are
parsed straight out of /root/reference, so an architectural
misunderstanding encoded identically in a twin and in our Flax port
cannot make it pass.
"""

import ast
import glob
import re

from stcd_tpu.encoders import encoder_names, encoder_out_channels

_REF_GLOB = "/root/reference/segmentation_models_pytorch/encoders/*.py"

# names where our registry intentionally deviates (documented):
_SKIP = set()


def _parse_ref_tables():
    """name -> out_channels from every `"<name>": {... "out_channels": (...)}`
    block in the reference encoder files (line-oriented scan; the files are
    uniformly black-formatted)."""
    out = {}
    name_rx = re.compile(r'^    "([\w\-.]+)": \{$')
    # dict-literal, kwarg (mix_transformer uses params=dict(out_channels=..)),
    # and inline-params (inceptionresnetv2) spellings
    oc_rx = re.compile(r'"out_channels": (\([\d, ]+\))|out_channels=(\([\d, ]+\))')
    for path in sorted(glob.glob(_REF_GLOB)):
        current = None
        for line in open(path):
            m = name_rx.match(line)
            if m:
                current = m.group(1)
                continue
            m = oc_rx.search(line)
            if m and current:
                out[current] = tuple(ast.literal_eval(m.group(1) or m.group(2)))
                current = None
    return out


_REF_TABLES = _parse_ref_tables()


def test_ref_tables_parsed():
    # the reference registers ~100 encoder configs across its files
    assert len(_REF_TABLES) >= 90, sorted(_REF_TABLES)[:10]
    assert _REF_TABLES["resnet50"] == (3, 64, 256, 512, 1024, 2048)


def test_every_shared_name_matches_reference_out_channels():
    ours = set(encoder_names())
    shared = sorted((ours & set(_REF_TABLES)) - _SKIP)
    assert len(shared) >= 60, f"suspiciously few shared names: {shared[:10]}"
    mismatches = {}
    for name in shared:
        want = _REF_TABLES[name]
        got = tuple(encoder_out_channels(name))
        if got != want:
            mismatches[name] = (got, want)
    assert not mismatches, f"out_channels diverge from the reference: {mismatches}"


def test_mobilenetv3_matches_reference_formula():
    """timm-mobilenetv3 out_channels are computed, not tabled, in the
    reference (encoders/timm_mobilenetv3.py:31-40 _get_channels): base
    [16,16,24,48,576] (small) / [16,24,40,112,960] (large), width-scaled
    through _make_divisible(8). Reproduce that formula and compare."""

    def make_divisible(v, divisor=8):
        new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
        if new_v < 0.9 * v:
            new_v += divisor
        return new_v

    for mode, base in (("small", [16, 16, 24, 48, 576]),
                       ("large", [16, 24, 40, 112, 960])):
        for wm, tag in ((0.75, "075"), (1.0, "100"), (1.0, "minimal_100")):
            name = f"timm-mobilenetv3_{mode}_{tag}"
            want = tuple([3] + [make_divisible(x * wm) for x in base])
            assert tuple(encoder_out_channels(name)) == want, name


def test_unmatched_names_are_expected():
    """Names we register that have no reference table entry must be known
    aliases or formula-computed families checked elsewhere (vgg*_bn follow
    the same table rows; timm-mobilenetv3 via the formula test above)."""
    ours = set(encoder_names())
    unmatched = sorted(ours - set(_REF_TABLES))
    for name in unmatched:
        base = name[:-3] if name.endswith("_bn") else name
        assert (base in _REF_TABLES
                or name.startswith("timm-mobilenetv3_")), (
            f"{name} is registered locally but unknown to the reference "
            f"registry — either remove it or document the addition")
