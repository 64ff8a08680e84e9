"""ChArUco utilities: generated board must be detectable, and a
synthetic calibration from rendered views must recover K.

The reference ships a static pattern PNG and a tyro CLI (reference:
src/utils/calibrate_camera.py:10-277, charuco_board_pattern.png); here
the pattern is generated on demand and the whole loop — render the
board under known homographies, detect, calibrate with distortion fixed
to zero — is closed in-process.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from visualodometry_tpu.utils.calibrate_camera import (  # noqa: E402
    calibrate_charuco,
    generate_board_image,
)


@pytest.mark.unit
def test_generated_board_is_detectable(tmp_path):
    from cv2 import aruco

    path = tmp_path / "board.png"
    generate_board_image(path, squares_x=8, squares_y=6)
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    assert img is not None and img.shape[0] > 100

    board = aruco.CharucoBoard(
        (8, 6), 0.025, 0.018, aruco.getPredefinedDictionary(aruco.DICT_4X4_100)
    )
    det = aruco.CharucoDetector(board)
    corners, ids, _, _ = det.detectBoard(img)
    assert corners is not None and len(corners) >= 20


@pytest.mark.integration
def test_calibration_recovers_K(tmp_path):
    """Warp the flat board into synthetic camera views; calibrate."""
    board_path = tmp_path / "board.png"
    generate_board_image(board_path, squares_x=8, squares_y=6)
    flat = cv2.imread(str(board_path), cv2.IMREAD_GRAYSCALE)
    H0, W0 = flat.shape

    W, H = 640, 480
    fx = fy = 600.0
    cx, cy = W / 2, H / 2
    K_true = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])

    # board plane: physical extent mapped to metric square_len units
    sq_px = W0 / 8.5  # includes margin
    m_per_px = 0.025 / sq_px

    img_dir = tmp_path / "views"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        rvec = rng.uniform(-0.35, 0.35, 3)
        tvec = np.array(
            [
                rng.uniform(-0.04, 0.04),
                rng.uniform(-0.03, 0.03),
                rng.uniform(0.28, 0.42),
            ]
        )
        R, _ = cv2.Rodrigues(rvec)
        # map board-pixel (u, v) -> plane point -> camera -> image
        corners_px = np.array(
            [[0, 0], [W0, 0], [W0, H0], [0, H0]], np.float64
        )
        plane = np.concatenate(
            [
                (corners_px - [W0 / 2, H0 / 2]) * m_per_px,
                np.zeros((4, 1)),
            ],
            axis=1,
        )
        proj, _ = cv2.projectPoints(plane, rvec, tvec, K_true, None)
        Hmat, _ = cv2.findHomography(
            corners_px.astype(np.float32), proj.reshape(-1, 2).astype(np.float32)
        )
        view = cv2.warpPerspective(
            flat, Hmat, (W, H), borderValue=180, flags=cv2.INTER_LINEAR
        )
        cv2.imwrite(str(img_dir / f"view_{i:02d}.png"), view)

    K_est, err, n = calibrate_charuco(
        img_dir, squares_x=8, squares_y=6, square_len=0.025, marker_len=0.018
    )
    assert n >= 6
    assert err < 1.0
    np.testing.assert_allclose(K_est[0, 0], fx, rtol=0.05)
    np.testing.assert_allclose(K_est[1, 1], fy, rtol=0.05)
    np.testing.assert_allclose(K_est[0, 2], cx, rtol=0.08)
