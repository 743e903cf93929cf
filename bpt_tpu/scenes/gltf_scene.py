"""glTF-model demo scenes (Cornell box + BVH mesh; HDRI variant).

Builders for the two mesh demos:

* `gltf_scene` — Cornell box with selectable quad light, two instanced
  spheres, and a BVH-accelerated glTF model
  (/root/reference/js/GLTFModelPathTracing_FragmentShader.js:612-643 and the
  host pipeline /root/reference/js/GLTF_Model_Path_Tracing.js:201-497).
* `hdri_scene` — open box (no ceiling / no quad light), two spheres, mesh,
  equirect HDR environment with brightest-texel sun estimation
  (/root/reference/js/HDRIEnvironmentPathTracing_FragmentShader.js:641-658,
  /root/reference/js/HDRI_Environment_Path_Tracing.js:764-827).

The reference's per-model presets (GLTF_Model_Path_Tracing.js:892-925):
UtahTeapot ×130, StanfordBunny ×0.05, StanfordDragon ×250, Duck ×10 (LH),
DamagedHelmet ×15 — pass those as `initial_scale` to `bpt_tpu.io.load_gltf`.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from bpt_tpu.accel.builder import build_bvh, triangle_aabbs
from bpt_tpu.camera import Camera
from bpt_tpu.env import sun_direction_from_hdr
from bpt_tpu.io.gltf import GLTFModel
from bpt_tpu.scenes.cornell import cornell_walls_rows, quad_light_rows
from bpt_tpu.scenes.types import (
    CLEARCOAT_DIFFUSE,
    DIFFUSE,
    METAL,
    Environment,
    Scene,
    TriangleMesh,
    UnitSpheres,
    make_quad,
    quads_from_rows,
)
from bpt_tpu.utils.transforms import invert_rigid, trs_matrix

WALL_RADIUS = 50.0
SPHERE_RADIUS = 16.0


def bake_triangle_attrs(model: GLTFModel) -> np.ndarray:
    """Per-triangle PBR material-DECISION attributes for the fused megakernel.

    The reference decides the material branch per texel from the decoded
    metallicRoughness / emissive textures inside the bounce loop
    (GLTFModelPathTracing_FragmentShader.js:434-462).  The TPU fused kernel
    cannot gather per-lane texels mid-loop (Mosaic has no general gather),
    so the *decisions* are baked per triangle here — sampled at the three
    vertex UVs + the centroid, sRGB-decoded (pow 2.2), classified per tap
    with the shader's thresholds, and decided by tap MAJORITY — while the
    continuous albedo / emissive *values* stay texel-exact via the kernel's
    deferred UV planes.  Triangles whose taps disagree can be subdivided
    until decision-uniform (split_mixed_decision_triangles).

    Returns (T, 4) float32: [mat_class (DIFFUSE/METAL/CLEARCOAT ids),
    roughness (decoded G mean, drives the metal lobe), emissive_flag,
    spare].
    """
    from bpt_tpu.scenes.types import CLEARCOAT_DIFFUSE as _COAT
    from bpt_tpu.scenes.types import DIFFUSE as _DIFF
    from bpt_tpu.scenes.types import METAL as _METAL

    T = model.p0.shape[0]
    attr = np.zeros((T, 4), np.float32)
    taps = [model.uv0, model.uv1, model.uv2,
            (model.uv0 + model.uv1 + model.uv2) / 3.0]

    def sample(tex):
        """(T, K, C) decoded texels at the taps."""
        h, w = tex.shape[0], tex.shape[1]
        out = []
        for uv in taps:
            xi = np.mod(np.floor(uv[:, 0] * w).astype(np.int64), w)
            yi = np.mod(np.floor(uv[:, 1] * h).astype(np.int64), h)
            out.append(np.power(np.maximum(tex[yi, xi], 0.0), 2.2))
        return np.stack(out, axis=1)

    attr[:, 0] = float(_DIFF)
    if model.metallic_roughness is not None:
        mr = sample(np.asarray(model.metallic_roughness))  # (T, K, C)
        # MAJORITY of per-tap classes — thresholding the tap MEAN would
        # classify any triangle touching a metal texel as metal (the mean
        # of one decoded 0.6 with three 0s still clears 0.01)
        cls_tap = np.where(mr[..., 1] > 0.01, float(_COAT), float(_DIFF))
        cls_tap = np.where(mr[..., 2] > 0.01, float(_METAL), cls_tap)
        for c in (_COAT, _METAL):
            n = (cls_tap == float(c)).sum(axis=1)
            attr[:, 0] = np.where(n * 2 > cls_tap.shape[1], float(c), attr[:, 0])
        attr[:, 1] = mr[..., 1].mean(axis=1).astype(np.float32)
    if model.emissive is not None:
        em = sample(np.asarray(model.emissive))
        emis_tap = em.max(axis=-1) > 0.01
        attr[:, 2] = (emis_tap.sum(axis=1) * 2 > emis_tap.shape[1]).astype(np.float32)
    return attr


def _decision_classes(model: GLTFModel, uv: np.ndarray) -> np.ndarray:
    """Per-(triangle, tap) PBR material class + emissive flag, encoded as a
    small int — the decisions the reference takes per texel
    (GLTFModelPathTracing_FragmentShader.js:434-462).  uv: (T, K, 2)."""
    T, K = uv.shape[:2]
    cls = np.zeros((T, K), np.int64)

    def tap(tex):
        h, w = tex.shape[0], tex.shape[1]
        xi = np.mod(np.floor(uv[..., 0] * w).astype(np.int64), w)
        yi = np.mod(np.floor(uv[..., 1] * h).astype(np.int64), h)
        return np.power(np.maximum(tex[yi, xi], 0.0), 2.2)

    if model.metallic_roughness is not None:
        mr = tap(np.asarray(model.metallic_roughness))
        cls = np.where(mr[..., 1] > 0.01, 1, cls)
        cls = np.where(mr[..., 2] > 0.01, 2, cls)
    if model.emissive is not None:
        em = tap(np.asarray(model.emissive))
        cls = cls + np.where(em.max(-1) > 0.01, 4, 0)
    return cls


_SPLIT_FIELDS = ("p0", "p1", "p2", "n0", "n1", "n2", "uv0", "uv1", "uv2")

# decision/variance taps: vertices + edge midpoints + centroid + 3 interior
_TAP_W = np.array([
    [1, 0, 0], [0, 1, 0], [0, 0, 1],
    [.5, .5, 0], [0, .5, .5], [.5, 0, .5],
    [1 / 3, 1 / 3, 1 / 3],
    [.6, .2, .2], [.2, .6, .2], [.2, .2, .6],
], np.float64)  # (K, 3) barycentric weights


def _split4(cur: dict, mixed: np.ndarray) -> dict:
    """4-way midpoint split of the masked triangles (geometry unchanged:
    exact splits), keeping the rest."""
    keep = {f: cur[f][~mixed] for f in _SPLIT_FIELDS}
    a = {f: cur[f][mixed] for f in _SPLIT_FIELDS}

    def mid(x, y):
        return (x + y) * 0.5

    parts = []
    for (v0, v1, v2) in (
        ("0", "m01", "m02"), ("m01", "1", "m12"),
        ("m02", "m12", "2"), ("m01", "m12", "m02"),
    ):
        def pick(prefix, which):
            if which in ("0", "1", "2"):
                return a[prefix + which]
            i, j = which[1], which[2]
            return mid(a[prefix + i], a[prefix + j])

        parts.append({
            "p0": pick("p", v0), "p1": pick("p", v1), "p2": pick("p", v2),
            "n0": pick("n", v0), "n1": pick("n", v1), "n2": pick("n", v2),
            "uv0": pick("uv", v0), "uv1": pick("uv", v1), "uv2": pick("uv", v2),
        })
    return {
        f: np.concatenate([keep[f]] + [p[f] for p in parts]).astype(np.float32)
        for f in _SPLIT_FIELDS
    }


def _perturbed_tap_normals(model_nm: np.ndarray, n: np.ndarray,
                           uv: np.ndarray) -> np.ndarray:
    """Tangent-space normal-map perturbation at (T, K) taps, the same math
    as _bake_vertex_normal_map / textures.perturb_normal.  n, uv: (T, K, 3/2)
    interpolated base normals + UVs.  Returns (T, K, 3) unit normals."""
    h, w = model_nm.shape[0], model_nm.shape[1]
    nl = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-10)
    up = np.where(np.abs(nl[..., 1:2]) < 0.9, [0.0, 1.0, 0.0], [1.0, 0.0, 0.0])
    s = np.cross(up, nl)
    s /= np.maximum(np.linalg.norm(s, axis=-1, keepdims=True), 1e-10)
    t = np.cross(nl, s)
    xi = np.mod(np.floor(uv[..., 0] * w).astype(np.int64), w)
    yi = np.mod(np.floor(uv[..., 1] * h).astype(np.int64), h)
    mp = model_nm[yi, xi, :3] * 2.0 - 1.0
    mp /= np.maximum(np.linalg.norm(mp, axis=-1, keepdims=True), 1e-10)
    out = s * mp[..., 0:1] + t * mp[..., 1:2] + nl * mp[..., 2:3]
    return out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-10)


def split_normal_variance_triangles(
    model: GLTFModel, max_depth: int = 3, max_angle_deg: float = 10.0
) -> GLTFModel:
    """Midpoint-subdivide triangles whose normal-MAP perturbed normal varies
    by more than ``max_angle_deg`` across the triangle.

    The fused megakernel bakes the normal map per VERTEX
    (_bake_vertex_normal_map) — exact where the perturbed normal is
    ~linear over the triangle, and the dominant term of the measured
    fused-vs-wavefront residual where it is not (VERDICT r4 #5).  Vertex
    bake converges to the per-texel reference as triangles shrink, so
    splitting exactly the high-variance triangles buys per-texel-class
    fidelity at a bounded triangle-count cost.  Geometry is unchanged
    (exact 4-way splits)."""
    if model.normal_map is None:
        return model
    nm = np.asarray(model.normal_map)
    cos_thresh = np.cos(np.deg2rad(max_angle_deg))
    cur = {f: np.asarray(getattr(model, f)) for f in _SPLIT_FIELDS}
    for _ in range(max_depth):
        n3 = np.stack([cur["n0"], cur["n1"], cur["n2"]], axis=1)  # (T,3,3)
        uv3 = np.stack([cur["uv0"], cur["uv1"], cur["uv2"]], axis=1)
        n_tap = np.einsum("kj,tjc->tkc", _TAP_W, n3)
        uv_tap = np.einsum("kj,tjc->tkc", _TAP_W, uv3)
        pn = _perturbed_tap_normals(nm, n_tap, uv_tap)  # (T, K, 3)
        mean = pn.mean(axis=1)
        mean /= np.maximum(np.linalg.norm(mean, axis=-1, keepdims=True), 1e-10)
        cosmin = np.einsum("tkc,tc->tk", pn, mean).min(axis=1)
        varying = cosmin < cos_thresh
        if not varying.any():
            break
        cur = _split4(cur, varying)
    return model._replace(**cur)


def split_mixed_decision_triangles(model: GLTFModel, max_depth: int = 2) -> GLTFModel:
    """Midpoint-subdivide triangles whose PBR decision maps take DIFFERENT
    branches within the triangle, until each (sub)triangle is
    decision-uniform or ``max_depth`` is reached.

    The fused megakernel bakes material DECISIONS per triangle
    (bake_triangle_attrs) — exact for decision-uniform triangles; this
    splitting shrinks mixed triangles until the bake matches the
    reference's per-texel decisions almost everywhere, at a small triangle-
    count cost.  Geometry is unchanged (exact 4-way splits), so the
    wavefront image is identical up to FP."""
    if model.albedo is None or (model.metallic_roughness is None
                                and model.emissive is None):
        return model

    cur = {f: np.asarray(getattr(model, f)) for f in _SPLIT_FIELDS}
    for _ in range(max_depth):
        uv = np.stack([cur["uv0"], cur["uv1"], cur["uv2"]], axis=1)  # (T,3,2)
        taps = np.einsum("kj,tjc->tkc", _TAP_W, uv)
        cls = _decision_classes(model, taps)
        mixed = (cls != cls[:, :1]).any(axis=1)
        if not mixed.any():
            break
        cur = _split4(cur, mixed)
        model = model._replace(**cur)
    return model._replace(**cur)


def _bake_vertex_normal_map(model: GLTFModel) -> tuple:
    """Per-VERTEX normal-map bake for the fused megakernel's dense pack.

    The fused kernel cannot gather normal-map texels mid-loop, so the
    tangent-space perturbation (perturbNormal,
    GLTFModelPathTracing_FragmentShader.js:72-92) is applied host-side at
    each vertex UV; the kernel's barycentric interpolation then yields
    vertex-frequency normal mapping (classic per-vertex approximation —
    the wavefront path stays per-texel).  Same cross-trick ONB and decode
    as textures.perturb_normal, in numpy.
    """
    nm = np.asarray(model.normal_map)
    h, w = nm.shape[0], nm.shape[1]

    def perturb(n, uv):
        nl = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-10)
        up = np.where(np.abs(nl[:, 1:2]) < 0.9, [[0.0, 1.0, 0.0]], [[1.0, 0.0, 0.0]])
        s = np.cross(up, nl)
        s /= np.maximum(np.linalg.norm(s, axis=-1, keepdims=True), 1e-10)
        t = np.cross(nl, s)
        xi = np.mod(np.floor(uv[:, 0] * w).astype(np.int64), w)
        yi = np.mod(np.floor(uv[:, 1] * h).astype(np.int64), h)
        mp = nm[yi, xi, :3] * 2.0 - 1.0
        mp /= np.maximum(np.linalg.norm(mp, axis=-1, keepdims=True), 1e-10)
        out = s * mp[:, 0:1] + t * mp[:, 1:2] + nl * mp[:, 2:3]
        return (out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-10)).astype(np.float32)

    return (
        perturb(np.asarray(model.n0), np.asarray(model.uv0)),
        perturb(np.asarray(model.n1), np.asarray(model.uv1)),
        perturb(np.asarray(model.n2), np.asarray(model.uv2)),
    )


def mesh_from_model(
    model: GLTFModel,
    mat_type: int = METAL,
    translation=(0.0, 0.0, 0.0),
    rotation=(0.0, 0.0, 0.0),
    scale=(1.0, 1.0, 1.0),
    leaf_size: int = 16,
    split_mixed: int = 0,
    split_normals: int = 0,
    split_normals_deg: float = 10.0,
    builder: str = "sah",
) -> TriangleMesh:
    """glTF soup → device TriangleMesh with a freshly built BVH.

    The transform is the runtime model TransformNode (uGLTF_Model_InvMatrix,
    GLTF_Model_Path_Tracing.js:1216-1217) — the *initial* scale is already
    baked into the vertices by load_gltf, as in the reference's packing.

    ``split_mixed``: midpoint-subdivision depth for triangles whose PBR
    decision maps are not uniform within the triangle (see
    split_mixed_decision_triangles); 0 disables.  Off by default: measured
    on DamagedHelmet @256², depth 2 (15.5K -> 29K tris) moves the fused-vs-
    wavefront image delta only 3.78% -> 3.76% of pixels (>1e-3) — the
    residual is dominated by the per-VERTEX normal-map bake, not by
    per-triangle decisions — while the 2x triangle count costs real walk
    throughput.  Enable it for assets whose decision maps alias visibly.
    """
    if split_mixed and model.albedo is not None:
        model = split_mixed_decision_triangles(model, max_depth=split_mixed)
    if split_normals and model.normal_map is not None:
        # attacks the DOMINANT fused-vs-wavefront residual (the per-vertex
        # normal-map bake, VERDICT r4 #5): vertex bake -> per-texel-class
        # as the high-variance triangles shrink
        model = split_normal_variance_triangles(
            model, max_depth=split_normals, max_angle_deg=split_normals_deg)
    mn, mx, _ = triangle_aabbs(model.p0, model.p1, model.p2)
    # binned SAH is the perf default: the packet walker pays for the
    # PACKET'S subtree union, and SAH's low-overlap splits cut its node
    # visits ~2x on organic meshes vs the reference's spatial-median split
    # (kept available as builder="median" — the reference-parity twin,
    # BVH_Fast_Builder.js:95-237)
    if builder == "sah":
        from bpt_tpu.accel.builder import build_bvh_sah

        bvh = build_bvh_sah(mn, mx)
    elif builder == "median":
        bvh = build_bvh(mn, mx)
    else:
        raise ValueError(f"unknown builder {builder!r} (sah|median)")
    m = trs_matrix(translation=translation, rotation=rotation, scale=scale)

    from bpt_tpu.accel.cluster import pack_bvh4_oct, pack_clustered

    pk = pack_clustered(
        bvh, model.p0, model.p1, model.p2, model.n0, model.n1, model.n2,
        model.uv0, model.uv1, model.uv2,
    )
    tri_attr = bake_triangle_attrs(model) if model.albedo is not None else None
    if model.normal_map is not None:
        # fused pack gets normal-map-perturbed vertex normals (see
        # _bake_vertex_normal_map); pk_/wavefront keep the exact per-texel path
        fn0, fn1, fn2 = _bake_vertex_normal_map(model)
    else:
        fn0, fn1, fn2 = model.n0, model.n1, model.n2
    fz = pack_bvh4_oct(
        bvh, model.p0, model.p1, model.p2, fn0, fn1, fn2,
        model.uv0, model.uv1, model.uv2, leaf_size=leaf_size,
        tri_attr=tri_attr,
    )

    def dev(a):
        return None if a is None else jnp.asarray(a)

    def qp(a):
        from bpt_tpu.textures import quad_pack

        return None if a is None else quad_pack(a)

    return TriangleMesh(
        pk_nodes_f=jnp.asarray(pk.nodes_f),
        pk_nodes_i=jnp.asarray(pk.nodes_i),
        pk_tris=jnp.asarray(pk.tris),
        pk_order=jnp.asarray(pk.tri_order),
        fz_nodes_f=jnp.asarray(fz.nodes_f),
        fz_tris=jnp.asarray(fz.tris),
        fz_nodes_oct=jnp.asarray(fz.nodes_oct),
        fz_woop=jnp.asarray(fz.woop),
        p0=jnp.asarray(model.p0),
        p1=jnp.asarray(model.p1),
        p2=jnp.asarray(model.p2),
        n0=jnp.asarray(model.n0),
        n1=jnp.asarray(model.n1),
        n2=jnp.asarray(model.n2),
        uv0=jnp.asarray(model.uv0),
        uv1=jnp.asarray(model.uv1),
        uv2=jnp.asarray(model.uv2),
        node_tri=jnp.asarray(bvh.node_tri),
        node_right=jnp.asarray(bvh.node_right),
        node_min=jnp.asarray(bvh.node_min),
        node_max=jnp.asarray(bvh.node_max),
        inv_matrix=invert_rigid(m),
        mat_type=jnp.asarray(mat_type, jnp.int32),
        albedo=dev(model.albedo),
        normal_map=dev(model.normal_map),
        metallic_roughness=dev(model.metallic_roughness),
        emissive=dev(model.emissive),
        albedo_q=qp(model.albedo),
        normal_map_q=qp(model.normal_map),
        metallic_roughness_q=qp(model.metallic_roughness),
        emissive_q=qp(model.emissive),
    )


def _demo_spheres() -> UnitSpheres:
    w, sr = WALL_RADIUS, SPHERE_RADIUS
    left_m = trs_matrix(translation=(-w * 0.45, -w + sr + 0.1, -w * 0.2), scale=(sr, sr, sr))
    right_m = trs_matrix(translation=(w * 0.45, -w + sr + 0.1, -w * 0.2), scale=(sr, sr, sr))
    return UnitSpheres(
        inv_matrix=jnp.stack([invert_rigid(left_m), invert_rigid(right_m)]),
        color=jnp.asarray(np.array([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]], np.float32)),
        mat_type=jnp.asarray(np.array([CLEARCOAT_DIFFUSE, METAL], np.int32)),
    )


def gltf_scene(
    mesh: TriangleMesh, quad_light_plane: int = 6, quad_light_radius: float = 50.0
) -> Scene:
    """Cornell box + quad light + 2 spheres + BVH mesh (glTF demo)."""
    rows = cornell_walls_rows()
    rows.append(quad_light_rows(quad_light_plane, quad_light_radius))
    return Scene(quads=quads_from_rows(rows), spheres=_demo_spheres(), mesh=mesh)


def hdri_scene(
    mesh: TriangleMesh,
    hdr_image: np.ndarray,
    hdr_exposure: float = 1.0,
    sun_power: float = 4.0,
    sun_direction: Optional[np.ndarray] = None,
) -> Scene:
    """Open box + 2 spheres + mesh + equirect environment (HDRI demo).

    sun_direction defaults to the brightest-texel estimate, like loadHDR.
    """
    w = WALL_RADIUS
    rows = [
        make_quad((0, 0, 1), (-w, w, w), (w, w, w), (w, -w, w), (-w, -w, w), (1, 1, 1), DIFFUSE),
        make_quad((1, 0, 0), (-w, -w, w), (-w, -w, -w), (-w, w, -w), (-w, w, w), (0.7, 0.05, 0.05), DIFFUSE),
        make_quad((-1, 0, 0), (w, -w, -w), (w, -w, w), (w, w, w), (w, w, -w), (0.05, 0.05, 0.7), DIFFUSE),
        make_quad((0, 1, 0), (-w, -w, w), (w, -w, w), (w, -w, -w), (-w, -w, -w), (1, 1, 1), DIFFUSE),
    ]
    if sun_direction is None:
        sun_direction = sun_direction_from_hdr(hdr_image)
    from bpt_tpu.env import build_env_cdf

    env = Environment(
        sun_direction=jnp.asarray(sun_direction, jnp.float32),
        sun_power=jnp.asarray(sun_power, jnp.float32),
        hdr_image=jnp.asarray(hdr_image, jnp.float32),
        hdr_exposure=jnp.asarray(hdr_exposure, jnp.float32),
        env_cdf=build_env_cdf(hdr_image),
    )
    return Scene(quads=quads_from_rows(rows), spheres=_demo_spheres(), mesh=mesh, env=env)


def gltf_camera() -> Camera:
    """glTF demo start camera (GLTF_Model_Path_Tracing.js:709)."""
    return Camera.look(position=(0.0, -20.0, -120.0), fov=0.8, focus_distance=113.0)


def hdri_camera() -> Camera:
    """HDRI demo start camera (HDRI_Environment_Path_Tracing.js:724)."""
    return Camera.look(position=(0.0, 0.0, -200.0), fov=0.8, focus_distance=113.0)
