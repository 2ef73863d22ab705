"""tools/parity_gate.py --smoke: every family's eval path must execute
end-to-end on synthetic data with random weights (VERDICT r2 next-round #7)."""


def test_parity_gate_smoke(capsys):
    import tools.parity_gate as PG

    rows = PG.main(["--smoke"])
    assert len(rows) == 6
    by_name = {r[0]: r for r in rows}
    for name in ("yolact_r50_550", "mask_rcnn_r50_fpn", "mask_rcnn_r50_c4",
                 "retinanet_r50", "yolov3_608", "pose2seg"):
        measured = by_name[name][1]
        assert measured is not None, f"{name}: {by_name[name][3]}"
        for v in measured.values():
            assert 0.0 <= v <= 100.0
