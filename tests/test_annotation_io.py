"""Round-trip tests for the reference's file formats: annotation
JSON → normalized YOLO labels → parsed back; denormalized
predictions → competition JSON."""

from __future__ import annotations

import json
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from datatransformertools_spark.functions.bbox import to_yolo
from datatransformertools_spark.sources.annotations import (
    read_annotation_json,
    read_yolo_predictions,
    write_competition_json,
    write_yolo_labels,
)


def _write_sample_annotations(d: Path) -> None:
    docs = [
        {
            "file_name": "doc_00001.png",
            "annotations": [
                {"bbox": [10.0, 20.0, 100.0, 50.0], "category_id": 1},
                {"bbox": [0.0, 0.0, 640.0, 480.0], "category_id": 4},
                {"bbox": [1.0, 2.0, 3.0], "category_id": 2},  # bad arity -> dropped
            ],
        },
        {"file_name": "doc_00002.png", "annotations": []},
    ]
    for doc in docs:
        (d / f"{doc['file_name'].split('.')[0]}.json").write_text(json.dumps(doc, indent=2))


def test_annotation_json_roundtrip(spark):
    tmp = Path(tempfile.mkdtemp(prefix="dtt-annio-"))
    raw = tmp / "jsons"
    raw.mkdir()
    _write_sample_annotations(raw)

    ann = read_annotation_json(spark, str(raw))
    rows = ann.collect()
    assert len(rows) == 2  # bad-arity bbox dropped, empty image contributes none
    assert {r.category_id for r in rows} == {1, 4}

    # normalize against a fixed 640x480 image and write YOLO labels
    xc, yc, wn, hn = to_yolo(
        F.col("x"), F.col("y"), F.col("w"), F.col("h"), F.lit(640.0), F.lit(480.0)
    )
    norm = ann.select(
        "file_name",
        "category_id",
        xc.alias("x_center"),
        yc.alias("y_center"),
        wn.alias("w_norm"),
        hn.alias("h_norm"),
    )
    labels_dir = tmp / "labels"
    write_yolo_labels(norm, str(labels_dir))

    back = read_yolo_predictions(spark, str(labels_dir)).collect()
    assert len(back) == 2
    by_cls = {r.category_id: r for r in back}
    assert by_cls[4].w_norm == 1.0 and by_cls[4].h_norm == 1.0
    assert abs(by_cls[1].x_center - (10 + 50) / 640) < 1e-5
    assert all(r.confidence is None for r in back)  # labels have no conf column

    shutil.rmtree(tmp, ignore_errors=True)


def test_competition_json_output(spark, sf_dir):
    from datatransformertools_spark.operators.annotations import yolo_denormalize

    tmp = Path(tempfile.mkdtemp(prefix="dtt-compjson-"))
    preds = yolo_denormalize(spark, sf_dir)
    out = tmp / "json_out"
    write_competition_json(preds, str(out))

    back = spark.read.json(str(out))
    assert set(back.columns) == {"file_name", "annotations", "corruption"}
    n_images = preds.select("file_name").distinct().count()
    assert back.count() == n_images
    one = back.filter(F.size("annotations") > 0).first()
    ann0 = one["annotations"][0]
    assert len(ann0["bbox"]) == 4 and ann0["category_name"] is not None
    shutil.rmtree(tmp, ignore_errors=True)
