"""Scene container (L3): data dispatch + camera lists + model snapshots.

Role of reference scene/__init__.py:30-124. Holds the loaded cameras and the
initial point cloud; Gaussian state creation/loading lives in
models.gaussians (functional), so Scene returns/accepts states instead of
mutating a model object.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List, Optional

import numpy as np

from guidedvd3dgs_tpu.models import gaussians as G
from guidedvd3dgs_tpu.scene import dataset_readers
from guidedvd3dgs_tpu.scene.camera_utils import camera_list_from_infos, camera_to_json
from guidedvd3dgs_tpu.scene.cameras import Camera
from guidedvd3dgs_tpu.scene.ply import load_gaussian_ply, save_gaussian_ply


def searchForMaxIteration(folder: str) -> int:
    iters = [
        int(f.split("_")[-1]) for f in os.listdir(folder) if f.startswith("iteration_")
    ]
    return max(iters)


class Scene:
    def __init__(
        self,
        args,
        load_iteration: Optional[int] = None,
        shuffle: bool = False,
        resolution_scales=(1.0,),
        replica_use_project_cam: bool = False,
        projected_dir: Optional[str] = None,
    ):
        self.model_path = args.model_path
        self.loaded_iter = None

        if load_iteration is not None:
            if load_iteration == -1:
                self.loaded_iter = searchForMaxIteration(
                    os.path.join(self.model_path, "point_cloud")
                )
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        # dataset dispatch (reference: scene/__init__.py:53-62)
        if os.path.exists(os.path.join(args.source_path, "sparse")):
            scene_info = dataset_readers.read_colmap_scene(
                args.source_path,
                args.images,
                args.dataset,
                args.eval,
                n_views=args.n_views,
                ply_path=getattr(args, "dust3r_ply", ""),
                replica_use_project_cam=replica_use_project_cam
                or getattr(args, "replica_use_project_cam", False),
                projected_dir=projected_dir,
                demo_setting=getattr(args, "demo_setting", False),
            )
        elif os.path.exists(os.path.join(args.source_path, "transforms_train.json")):
            scene_info = dataset_readers.read_blender_scene(
                args.source_path, args.white_background, args.eval
            )
        else:
            raise ValueError(f"Could not recognize scene type at {args.source_path}")
        self.scene_info = scene_info
        self.scene_info_train_cams = scene_info.train_cameras
        self.scene_info_all_cams = scene_info.all_cameras
        self.scene_info_train_indices = scene_info.train_indices

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            if os.path.exists(scene_info.ply_path):
                shutil.copyfile(
                    scene_info.ply_path, os.path.join(self.model_path, "input.ply")
                )
            cam_json = [
                camera_to_json(i, c)
                for i, c in enumerate(
                    camera_list_from_infos(
                        scene_info.train_cameras + scene_info.test_cameras, 1.0, args
                    )
                )
            ]
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump(cam_json, f)

        if shuffle:
            rng = np.random.default_rng(0)
            rng.shuffle(scene_info.train_cameras)
            rng.shuffle(scene_info.test_cameras)

        self.cameras_extent = scene_info.nerf_normalization["radius"]

        self.train_cameras: Dict[float, List[Camera]] = {}
        self.test_cameras: Dict[float, List[Camera]] = {}
        self.project_cameras: Dict[float, List[Camera]] = {}
        for scale in resolution_scales:
            self.train_cameras[scale] = camera_list_from_infos(
                scene_info.train_cameras, scale, args
            )
            self.test_cameras[scale] = camera_list_from_infos(
                scene_info.test_cameras, scale, args
            )
            if scene_info.project_cameras:
                self.project_cameras[scale] = camera_list_from_infos(
                    scene_info.project_cameras, scale, args
                )

        self._args = args

    # ------------------------------------------------------------------
    def create_gaussians(self, capacity: int = 0, max_sh_degree: int = 3, use_color: bool = True):
        """Initial Gaussian state from the scene point cloud, or reload a
        snapshot when load_iteration was given."""
        if self.loaded_iter:
            return self.load_gaussians(self.loaded_iter, max_sh_degree)
        pcd = self.scene_info.point_cloud
        return G.create_from_pcd(
            np.asarray(pcd.points, np.float32),
            np.asarray(pcd.colors, np.float32),
            capacity=capacity,
            max_sh_degree=max_sh_degree,
            use_color=use_color,
        )

    def load_gaussians(self, iteration: int, max_sh_degree: int = 3):
        import jax.numpy as jnp

        path = os.path.join(
            self.model_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"
        )
        arrs = load_gaussian_ply(path)
        n = arrs["xyz"].shape[0]
        cap = G.default_capacity(n)
        st = G.create_from_pcd(arrs["xyz"], np.zeros((n, 3), np.float32), capacity=cap,
                               max_sh_degree=max_sh_degree)
        pad = cap - n

        def padded(x):
            return jnp.asarray(np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)))

        params = G.GaussianParams(
            xyz=padded(arrs["xyz"]),
            features_dc=padded(arrs["features_dc"]),
            features_rest=padded(arrs["features_rest"]),
            scaling=padded(arrs["scaling"]),
            rotation=padded(arrs["rotation"]),
            opacity=padded(arrs["opacity"]),
        )
        return st._replace(params=params)

    def save(self, iteration: int, state: G.GaussianState):
        """Write point_cloud/iteration_N/point_cloud.ply (reference:
        scene/__init__.py:110-112)."""
        path = os.path.join(
            self.model_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"
        )
        save_gaussian_ply(path, state.params, np.asarray(state.active))

    # ------------------------------------------------------------------
    def getTrainCameras(self, scale: float = 1.0) -> List[Camera]:
        return self.train_cameras[scale]

    def getTestCameras(self, scale: float = 1.0) -> List[Camera]:
        return self.test_cameras[scale]

    def getProjectCameras(self, scale: float = 1.0) -> List[Camera]:
        return self.project_cameras.get(scale, [])
