"""DVMVS-style online keyframe selection (host-side, pure numpy).

Re-implements the frame-selection policy of DeepVideoMVS as used by the
reference (`tools/keyframe_buffer.py:12-381`): a new keyframe is accepted
when its pose distance to the last keyframe exceeds a threshold; source
views for a reference frame are the buffered keyframes with the lowest
penalty |R|^2 + w*|t - t_opt|^2 (w = 5 when too close). This module drives
both offline tuple generation and the online/live reconstruction path, so
its numerics must match the shipped `data_splits` tuple files exactly.

Return codes from `try_new_keyframe` match the reference:
  0 first frame accepted, no prediction yet
  1 keyframe accepted, predict now
  2 pose valid but too close to the last keyframe
  3 tracking lost, buffer reset
  4 still lost (buffer already empty)
  5 pose missing but not yet lost
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional, Tuple

import numpy as np


class DVMVS_Config:
    """Constants from DeepVideoMVS (`tools/keyframe_buffer.py:12-22`)."""
    # train tuple settings
    train_minimum_pose_distance = 0.125
    train_maximum_pose_distance = 0.325
    train_crawl_step = 3

    # test tuple settings
    test_keyframe_buffer_size = 30
    test_keyframe_pose_distance = 0.1
    test_optimal_t_measure = 0.15
    test_optimal_R_measure = 0.0


def is_pose_available(pose) -> bool:
    """A pose is usable iff it is fully finite."""
    return bool(np.isfinite(np.asarray(pose, dtype=np.float64)).all())


def pose_distance(reference_pose: np.ndarray, measurement_pose: np.ndarray
                  ) -> Tuple[float, float, float]:
    """DVMVS pose distance between two camera-to-world poses.

    Returns (combined, R_measure, t_measure) where
    R_measure = sqrt(2 * (1 - min(3, trace(R_rel)) / 3)) and
    t_measure = ||t_rel|| (`tools/keyframe_buffer.py:54-70`).
    """
    rel = np.linalg.inv(reference_pose) @ measurement_pose
    R_measure = np.sqrt(2.0 * (1.0 - min(3.0, float(np.trace(rel[:3, :3]))) / 3.0))
    t_measure = float(np.linalg.norm(rel[:3, 3]))
    return float(np.sqrt(t_measure ** 2 + R_measure ** 2)), R_measure, t_measure


def is_valid_pair(reference_pose, measurement_pose, pose_dist_min,
                  pose_dist_max, t_norm_threshold: float = 0.05,
                  return_measure: bool = False):
    """Train-tuple pair validity test (`tools/keyframe_buffer.py:33-52`)."""
    combined, _, t_measure = pose_distance(reference_pose, measurement_pose)
    ok = (pose_dist_min <= combined <= pose_dist_max
          and t_measure >= t_norm_threshold)
    return (ok, combined) if return_measure else ok


def _penalty(t_score: float, R_score: float,
             optimal_t: float, optimal_R: float) -> float:
    """Source-view selection penalty (`tools/keyframe_buffer.py:89-97`)."""
    R_penalty = abs(R_score - optimal_R) ** 2.0
    t_diff = t_score - optimal_t
    if t_diff < 0.0:
        return R_penalty + 5.0 * (abs(t_diff) ** 2.0)
    return R_penalty + abs(t_diff) ** 2.0


class KeyframeBuffer:
    """Online keyframe buffer: accept when far enough from the *last*
    keyframe; sources chosen by lowest penalty via argpartition."""

    def __init__(self, buffer_size: int, keyframe_pose_distance: float,
                 optimal_t_score: float, optimal_R_score: float,
                 store_return_indices: bool):
        self.buffer = deque([], maxlen=buffer_size)
        self.keyframe_pose_distance = keyframe_pose_distance
        self.optimal_t_score = optimal_t_score
        self.optimal_R_score = optimal_R_score
        self._tracking_lost_counter = 0
        self._store_return_indices = store_return_indices

    def _entry(self, pose, image, index):
        if self._store_return_indices:
            if index is None:
                raise ValueError("index required when store_return_indices")
            return (pose, image, index)
        return (pose, image)

    def try_new_keyframe(self, pose, image, dist_to_last_valid=None,
                         index=None) -> int:
        # A gap in valid-frame indices signals a tracking break
        # (`tools/keyframe_buffer.py:107-115`).
        if dist_to_last_valid is not None and dist_to_last_valid > 30:
            self.buffer.clear()
            self._tracking_lost_counter = 0
            self.buffer.append(self._entry(pose, image, index))
            return 3

        if is_pose_available(pose):
            self._tracking_lost_counter = 0
            if len(self.buffer) == 0:
                self.buffer.append(self._entry(pose, image, index))
                return 0
            last_pose = self.buffer[-1][0]
            combined, _, _ = pose_distance(pose, last_pose)
            if combined >= self.keyframe_pose_distance:
                self.buffer.append(self._entry(pose, image, index))
                return 1
            return 2

        self._tracking_lost_counter += 1
        if self._tracking_lost_counter > 30:
            if len(self.buffer) > 0:
                self.buffer.clear()
                return 3
            return 4
        return 5

    def get_best_measurement_frames(self, n_requested: int) -> List:
        frames = list(self.buffer)
        ref_pose = frames[-1][0]
        n = min(n_requested, len(frames) - 1)
        penalties = []
        for i in range(len(frames) - 1):
            _, R_m, t_m = pose_distance(ref_pose, frames[i][0])
            penalties.append(_penalty(t_m, R_m, self.optimal_t_score,
                                      self.optimal_R_score))
        idx = np.argpartition(penalties, n - 1)[:n]
        return [frames[i] for i in idx]


class SimpleBuffer:
    """Every valid frame is a keyframe (`tools/keyframe_buffer.py:189-243`)."""

    def __init__(self, buffer_size: int, store_return_indices: bool):
        self.buffer = deque([], maxlen=buffer_size + 1)
        self._tracking_lost_counter = 0
        self._store_return_indices = store_return_indices

    def try_new_keyframe(self, pose, image, index=None) -> int:
        entry = ((pose, image, index) if self._store_return_indices
                 else (pose, image))
        if self._store_return_indices and index is None:
            raise ValueError("index required when store_return_indices")
        if is_pose_available(pose):
            self._tracking_lost_counter = 0
            was_empty = len(self.buffer) == 0
            self.buffer.append(entry)
            return 0 if was_empty else 1
        self._tracking_lost_counter += 1
        if self._tracking_lost_counter > 30:
            if len(self.buffer) > 0:
                self.buffer.clear()
                return 2
            return 3
        return 4

    def get_measurement_frames(self) -> List:
        return list(self.buffer)[:-1]


class OfflineKeyframeBuffer:
    """Offline variant: accept a frame only if it is far enough from *every*
    buffered keyframe (`tools/keyframe_buffer.py:245-381`)."""

    def __init__(self, buffer_size: int, keyframe_pose_distance: float,
                 optimal_t_score: float, optimal_R_score: float,
                 store_return_indices: bool):
        self.buffer = deque([], maxlen=buffer_size)
        self.keyframe_pose_distance = keyframe_pose_distance
        self.optimal_t_score = optimal_t_score
        self.optimal_R_score = optimal_R_score
        self._tracking_lost_counter = 0
        self._store_return_indices = store_return_indices

    def _entry(self, pose, image, index):
        if self._store_return_indices:
            if index is None:
                raise ValueError("index required when store_return_indices")
            return (pose, image, index)
        return (pose, image)

    def try_new_keyframe(self, pose, image, index=None) -> int:
        if is_pose_available(pose):
            self._tracking_lost_counter = 0
            if len(self.buffer) == 0:
                self.buffer.append(self._entry(pose, image, index))
                return 0
            for buffered in self.buffer:
                combined, _, _ = pose_distance(pose, buffered[0])
                if combined < self.keyframe_pose_distance:
                    return 2
            self.buffer.append(self._entry(pose, image, index))
            return 1
        self._tracking_lost_counter += 1
        if self._tracking_lost_counter > 30:
            if len(self.buffer) > 0:
                self.buffer.clear()
                return 3
            return 4
        return 5

    def get_best_measurement_frames(self, n_requested: int) -> List:
        frames = list(self.buffer)
        ref_pose = frames[-1][0]
        n = min(n_requested, len(frames) - 1)
        penalties = []
        for i in range(len(frames) - 1):
            _, R_m, t_m = pose_distance(ref_pose, frames[i][0])
            penalties.append(_penalty(t_m, R_m, self.optimal_t_score,
                                      self.optimal_R_score))
        idx = np.argpartition(penalties, n - 1)[:n]
        return [frames[i] for i in idx]

    def get_best_measurement_frames_for_0index(self, n_requested: int) -> List:
        """Source selection for the *first* buffered frame as reference,
        used by offline test tuples (`tools/keyframe_buffer.py:357-381`).

        Note: mirrors the reference exactly, including that the reference
        frame itself (index 0 of the trimmed list) participates in the
        candidate pool.
        """
        frames = list(self.buffer)[1:]
        if len(frames) == 0:
            return []
        ref_pose = frames[0][0]
        n = min(n_requested, len(frames) - 1)
        penalties = []
        for i in range(len(frames)):
            _, R_m, t_m = pose_distance(ref_pose, frames[i][0])
            penalties.append(_penalty(t_m, R_m, self.optimal_t_score,
                                      self.optimal_R_score))
        idx = np.argpartition(penalties, n - 1)[:n]
        return [frames[i] for i in idx]
