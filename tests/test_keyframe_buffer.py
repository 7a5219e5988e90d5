"""Behavioral tests for the DVMVS keyframe policy."""

import numpy as np
import pytest

from simplerecon_tpu.data.keyframe_buffer import (
    DVMVS_Config, KeyframeBuffer, OfflineKeyframeBuffer, SimpleBuffer,
    is_valid_pair, pose_distance)


def pose_at(x, y=0.0, z=0.0):
    T = np.eye(4)
    T[:3, 3] = [x, y, z]
    return T


def make_buffer(**kw):
    args = dict(buffer_size=DVMVS_Config.test_keyframe_buffer_size,
                keyframe_pose_distance=DVMVS_Config.test_keyframe_pose_distance,
                optimal_t_score=DVMVS_Config.test_optimal_t_measure,
                optimal_R_score=DVMVS_Config.test_optimal_R_measure,
                store_return_indices=True)
    args.update(kw)
    return KeyframeBuffer(**args)


class TestKeyframeBuffer:
    def test_first_frame_returns_0(self):
        buf = make_buffer()
        assert buf.try_new_keyframe(pose_at(0), None, index=0) == 0

    def test_too_close_rejected(self):
        buf = make_buffer()
        buf.try_new_keyframe(pose_at(0), None, index=0)
        assert buf.try_new_keyframe(pose_at(0.05), None, index=1) == 2
        assert len(buf.buffer) == 1

    def test_far_enough_accepted(self):
        buf = make_buffer()
        buf.try_new_keyframe(pose_at(0), None, index=0)
        assert buf.try_new_keyframe(pose_at(0.11), None, index=1) == 1
        assert len(buf.buffer) == 2

    def test_tracking_lost_after_31_bad_poses(self):
        buf = make_buffer()
        buf.try_new_keyframe(pose_at(0), None, index=0)
        bad = np.full((4, 4), np.nan)
        codes = [buf.try_new_keyframe(bad, None, index=i + 1)
                 for i in range(31)]
        assert codes[:30] == [5] * 30
        assert codes[30] == 3
        assert len(buf.buffer) == 0

    def test_dist_to_last_valid_resets(self):
        buf = make_buffer()
        buf.try_new_keyframe(pose_at(0), None, index=0)
        code = buf.try_new_keyframe(pose_at(5), None, dist_to_last_valid=31,
                                    index=1)
        assert code == 3
        assert len(buf.buffer) == 1  # reset then re-seeded with this frame

    def test_source_selection_prefers_optimal_baseline(self):
        # optimal translation distance is 0.15; too-close frames get a 5x
        # penalty so a frame at ~0.15 m must be preferred over closer ones.
        buf = make_buffer()
        for i, x in enumerate([0.0, 0.12, 0.30, 0.45]):
            buf.try_new_keyframe(pose_at(x), None, index=i)
        # reference frame is the last (x=0.45)
        frames = buf.get_best_measurement_frames(2)
        xs = sorted(f[0][0, 3] for f in frames)
        assert xs == [0.12, 0.30]  # distances 0.33, 0.15 beat 0.45


class TestOfflineBuffer:
    def test_rejects_near_any_buffered(self):
        buf = OfflineKeyframeBuffer(30, 0.1, 0.15, 0.0, False)
        buf.try_new_keyframe(pose_at(0), None)
        buf.try_new_keyframe(pose_at(0.2), None)
        # close to the FIRST (not last) keyframe -> rejected
        assert buf.try_new_keyframe(pose_at(0.05), None) == 2


class TestSimpleBuffer:
    def test_accepts_everything_valid(self):
        buf = SimpleBuffer(3, False)
        assert buf.try_new_keyframe(pose_at(0), None) == 0
        assert buf.try_new_keyframe(pose_at(0.001), None) == 1
        assert len(buf.get_measurement_frames()) == 1


class TestPairValidity:
    def test_is_valid_pair_window(self):
        a = pose_at(0)
        assert is_valid_pair(a, pose_at(0.2), 0.125, 0.325)
        assert not is_valid_pair(a, pose_at(0.05), 0.125, 0.325)  # too close
        assert not is_valid_pair(a, pose_at(0.5), 0.125, 0.325)  # too far

    def test_t_norm_threshold(self):
        # rotation-only motion with tiny translation fails the t threshold
        a = pose_at(0)
        b = np.eye(4)
        th = 0.3
        b[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                              [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        b[0, 3] = 0.01
        assert not is_valid_pair(a, b, 0.125, 0.325)


def test_pose_distance_relative():
    a = pose_at(1.0)
    b = pose_at(1.0 + 3.0, 4.0)
    c, r, t = pose_distance(a, b)
    assert abs(t - 5.0) < 1e-9 and abs(r) < 1e-9 and abs(c - 5.0) < 1e-9
