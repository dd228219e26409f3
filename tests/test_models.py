"""Host data-model unit tests: Frame grid/counters, MapPoint descriptor
election, MapManager cascades, MotionModel, Camera, ReplaySaver."""
import numpy as np
import pytest

from slamtpu import Camera, Params
from slamtpu import hostmath as hm
from slamtpu.io.saver import ReplaySaver
from slamtpu.models.extractor import Extractor
from slamtpu.models.frame import Frame
from slamtpu.models.map_manager import MapManager
from slamtpu.models.map_point import MapPoint, mappoint_min_distance
from slamtpu.models.motion_model import MotionModel
from slamtpu.ops.features import pack_descriptor_bits


def make_camera():
    return Camera(100.0, 100.0, 64.0, 48.0, 96, 128)


def make_mm(params=None):
    params = params or Params(max_nb_keypoints=100, max_distance=16)
    cam = make_camera()
    frame = Frame(cam, cell_size=params.max_distance)
    ex = Extractor(params.max_nb_keypoints, 8, (6, 8), 16, capacity=128)
    return MapManager(params, frame, ex), frame


def test_frame_counters_and_grid():
    f = Frame(make_camera(), cell_size=16)
    f.add_keypoint_from_pixel([10.0, 10.0], 0)
    f.add_keypoint_from_pixel([12.0, 12.0], 1)
    f.add_keypoint_from_pixel([40.0, 90.0], 2)
    assert f.nb_keypoints == 3
    assert f.nb_2d_kpts == 3
    assert f.nb_occupied_cells == 2  # two kps share a cell

    f.turn_keypoint_3d(0)
    assert f.nb_3d_kpts == 1 and f.nb_2d_kpts == 2

    # Moving a keypoint across cells updates occupancy.
    f.update_keypoint(1, [80.0, 20.0])
    assert f.nb_occupied_cells == 3
    f.remove_keypoint(1)
    assert f.nb_occupied_cells == 2
    assert f.nb_keypoints == 2

    near = f.get_surrounding_keypoints([11.0, 11.0])
    assert {kp.id for kp in near} == {0}


def test_frame_update_keypoint_id():
    f = Frame(make_camera(), cell_size=16)
    f.add_keypoint_from_pixel([10.0, 10.0], 0)
    assert f.update_keypoint_id(0, 5, True)
    assert 5 in f.keypoints and 0 not in f.keypoints
    assert f.keypoints[5].is_retracked
    assert f.nb_3d_kpts == 1
    # Collision -> refused.
    f.add_keypoint_from_pixel([20.0, 20.0], 7)
    assert not f.update_keypoint_id(7, 5, False)


def test_mappoint_descriptor_election():
    rng = np.random.default_rng(0)
    d = [pack_descriptor_bits(rng.integers(0, 2, (1, 256)))[0]
         for _ in range(3)]
    mp = MapPoint(0, 0, d[0])
    mp.add_keyframe_observation(1)
    mp.add_descriptor(1, d[1])
    mp.add_keyframe_observation(2)
    mp.add_descriptor(2, d[2])
    assert mp.descriptor is not None
    assert mp.get_observers() == [0, 1, 2]
    mp.remove_kf_observation(0)
    assert mp.kfid == 1  # anchor re-elected
    assert 0 not in mp.keyframes_descriptors

    mp2 = MapPoint(1, 0, d[0])
    assert mappoint_min_distance(mp, mp2) <= 256


def test_mappoint_is_bad():
    mp = MapPoint(0, 0)
    mp.set_position([1.0, 2.0, 3.0])
    mp.is_observed = False
    assert mp.is_bad()  # one observer, unobserved, 3d
    assert not mp.is_3d


def test_map_manager_remove_cascades():
    mm, frame = make_mm()
    # Two keyframes observing a shared mappoint.
    frame.add_keypoint_from_pixel([10.0, 10.0], 0)
    mm.add_mappoint()
    mm.create_keyframe_for_test = None
    frame.kfid = 0
    mm.frames_map[0] = frame.deep_clone()
    mm.nb_keyframes = 1
    mm.current_keyframe_id = 1
    mp = mm.map_points[0]
    mp.add_keyframe_observation(1)
    frame.kfid = 1
    mm.frames_map[1] = frame.deep_clone()
    mm.nb_keyframes = 2
    mm.frames_map[0].add_covisibility(1, 1)
    mm.frames_map[1].add_covisibility(0, 1)

    mm.remove_mappoint_obs(0, 1)
    assert mp.get_observers() == [0]
    assert 0 not in mm.frames_map[1].keypoints

    mm.remove_keyframe(0)
    assert 0 not in mm.frames_map
    assert mp.get_observers() == []


def test_map_manager_merge_mappoints():
    mm, frame = make_mm()
    frame.kfid = 0
    frame.add_keypoint_from_pixel([10.0, 10.0], 0)
    mm.add_mappoint()
    frame.add_keypoint_from_pixel([50.0, 50.0], 1)
    mm.add_mappoint()
    mm.frames_map[0] = frame.deep_clone()
    mm.nb_keyframes = 1
    mm.map_points[1].set_position([0.0, 0.0, 5.0])
    mm.nb_mappoints = 2

    mm.merge_mappoints(0, 1)
    assert 0 not in mm.map_points
    # Keyframe 0 now observes mappoint 1 through the re-mapped keypoint...
    # it already had keypoint 1, so the swap is refused there, but the
    # current frame handling must not crash and mappoint 0 is gone.
    assert 1 in mm.map_points


def test_motion_model_predict_update():
    m = MotionModel()
    wc0 = np.eye(4)
    m.update(wc0, 0.0)
    wc1 = hm.se3_exp(np.array([0, 0, 0, 0.1, 0.0, 0.0]))
    m.update(wc1, 1.0)
    pred = m.predict(wc1, 2.0)
    # Constant velocity: expect another +0.1 in x.
    assert np.allclose(pred[:3, 3], [0.2, 0.0, 0.0], atol=1e-9)
    with pytest.raises(ValueError):
        m.update(wc1, 0.5)


def test_camera_distortion_roundtrip():
    cam = Camera(100.0, 100.0, 64.0, 48.0, 96, 128, k1=0.05, k2=-0.01,
                 p1=0.001, p2=-0.002)
    # undistort applies the polynomial once; with zero distortion identity.
    cam0 = make_camera()
    px = np.array([30.0, 50.0])
    assert np.allclose(cam0.undistort_point(px), px)
    # project/backproject round trip.
    ray = cam0.backproject(px)
    assert np.allclose(cam0.project(ray * 7.0), px)
    # Distorted camera shifts the point.
    assert not np.allclose(cam.undistort_point(px), px)


def test_replay_saver_roundtrip(tmp_path):
    s = ReplaySaver()
    wc = np.eye(4)
    wc[:3, 3] = [1.0, 2.0, 3.0]
    s.set_frame_wc(1, np.eye(4))
    s.set_frame_wc(2, wc)
    s.set_frame_wc(2, wc)  # overwrite on update
    assert len(s.positions) == 2
    # Axis swap (x, z, y) stored; trajectory_xyz undoes it.
    assert np.allclose(s.trajectory()[1], [1.0, 3.0, 2.0])
    assert np.allclose(s.trajectory_xyz()[1], [1.0, 2.0, 3.0])

    s.save(str(tmp_path))
    s2 = ReplaySaver()
    s2.load(str(tmp_path))
    assert np.allclose(s2.trajectory_xyz(), s.trajectory_xyz())


def test_params_reset():
    p = Params()
    p.vision_initialized = True
    p.reset_required = True
    p.reset()
    assert not p.vision_initialized and not p.reset_required
