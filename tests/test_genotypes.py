"""Genotype schema tests: structure of the released NPPNet genotypes
(reference models/genotypes.py:30-54)."""
from npp_tpu import genotypes as gt


def test_encoder_structure():
    assert len(gt.ENCODER.normal) == 8
    assert len(gt.ENCODER.reduce) == 8
    assert gt.ENCODER.normal_concat == (2, 3, 4, 5)
    # Every op must be a known primitive with a valid input index.
    for i, (name, idx) in enumerate(gt.ENCODER.normal):
        assert name in gt.PRIMITIVES_PC or name in gt.PRIMITIVES_INTER
        step = i // 2
        assert 0 <= idx < step + 2


def test_decoder_structure():
    assert len(gt.DECODER.upsample1) == 8
    assert len(gt.DECODER.upsample2) == 8
    assert gt.DECODER.upsample_concat1 == (2, 3, 4, 5)


def test_inter_structure():
    # Encoder injections: one group per scale, indices address features seen
    # so far (<= group index).
    assert len(gt.INTER.task1) == 4
    assert len(gt.INTER.task2) == 4
    for g, group in enumerate(gt.INTER.task1):
        for name, idx in group:
            assert name in gt.PRIMITIVES_INTER
            assert 0 <= idx <= g
    # Decoder injections: 3 groups over the growing 7-slot pyramid.
    assert len(gt.INTER.task3) == 3
    assert len(gt.INTER.task4) == 3
    for g, group in enumerate(gt.INTER.task3):
        for name, idx in group:
            assert 0 <= idx <= 4 + g


def test_fusion_structure():
    assert len(gt.FUSION.pose) == 8
    assert len(gt.FUSION.par) == 8
    assert gt.FUSION.pose_concat == (3, 4, 5, 6)
    for i, (name, idx) in enumerate(gt.FUSION.pose):
        step = i // 2
        assert 0 <= idx < step + 3


def test_genotypes_hashable():
    # Required so they can parameterize jitted constructors.
    hash(gt.ENCODER)
    hash(gt.INTER)
    hash(gt.FUSION)
    hash(gt.DECODER)


def test_genotype_json_roundtrip(tmp_path):
    path = str(tmp_path / "geno.json")
    gt.save_genotypes(path, gt.INTER, gt.FUSION, meta={"epoch": 3})
    inter, fuse = gt.load_genotypes(path)
    assert inter == gt.INTER
    assert fuse == gt.FUSION
