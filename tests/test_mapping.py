import numpy as np

from awesome_tpu.data.fbms import trajectories_frame_to_mask, Trajectory
from awesome_tpu.data.mapping import (
    GroundTruthForegroundIdMapping,
    MappingCollection,
    match_ids,
)


def test_match_ids_by_overlap():
    h = w = 16
    gt = np.zeros((h, w), np.int32)  # background value 0
    gt[2:8, 2:8] = 100  # region A
    gt[10:14, 10:14] = 200  # region B
    trajs = [
        Trajectory(7, np.asarray([[3.0, 3.0], [4.0, 5.0]]), np.asarray([0, 0])),
        Trajectory(9, np.asarray([[11.0, 12.0]]), np.asarray([0])),
        Trajectory(0, np.asarray([[0.0, 0.0], [15.0, 0.0]]),
                   np.asarray([0, 0])),
    ]
    masks, ids = trajectories_frame_to_mask(trajs, 0, (h, w))
    m = match_ids([gt], [(masks, ids)], sequence="seq")
    assert m.object_to_gt[7] == 100
    assert m.object_to_gt[9] == 200
    assert m.object_to_gt[0] == 0
    assert m.background_gt_value == 0
    assert set(m.foreground_object_ids()) == {7, 9}


def test_mapping_collection_roundtrip(tmp_path):
    path = str(tmp_path / "mappings.json")
    col = MappingCollection(path)
    col.put(GroundTruthForegroundIdMapping(
        sequence="cars1", gt_to_object={100: 7}, object_to_gt={7: 100},
        background_gt_value=0,
    ))
    col.save()
    col2 = MappingCollection(path)
    m = col2.get("cars1")
    assert m is not None and m.gt_to_object[100] == 7
