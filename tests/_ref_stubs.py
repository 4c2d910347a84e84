"""Stub modules that let individual REFERENCE model files load standalone
for golden-parity testing (the reference's own deps — timm, torchvision,
gcn_lib — are absent on this host, and its models/__init__ cannot run).

Only import-time symbols are stubbed; anything numerically relevant to an
eval-mode forward (DropPath at eval = identity, trunc_normal_ init) is
faithful. Instantiating ViG models through these stubs is NOT valid —
gcn_lib.Grapher here is an identity placeholder for import only.
"""

import importlib.util
import os
import sys
import types

REF = "/root/reference/models"


def install_ref_stubs():
    import torch
    import torch.nn as nn

    if "timm" in sys.modules and not hasattr(sys.modules["timm"], "_stcd_stub"):
        return  # a real timm exists; nothing to do

    timm = types.ModuleType("timm")
    timm._stcd_stub = True
    timm.__path__ = []
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    models_m = types.ModuleType("timm.models")
    models_m.__path__ = []
    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    class DropPath(nn.Module):
        """timm stochastic depth; identity in eval mode (the golden path)."""

        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or not self.drop_prob:
                return x
            keep = 1.0 - self.drop_prob
            mask = (torch.rand(x.shape[0], *([1] * (x.ndim - 1)),
                               device=x.device) < keep).to(x.dtype)
            return x * mask / keep

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    helpers = types.ModuleType("timm.models.helpers")
    helpers.load_pretrained = lambda *a, **k: None
    resnet_m = types.ModuleType("timm.models.resnet")
    resnet_m.resnet26d = resnet_m.resnet50d = lambda *a, **k: nn.Identity()
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    timm.data = data
    timm.models = models_m
    models_m.layers = layers
    models_m.helpers = helpers
    models_m.resnet = resnet_m
    models_m.registry = registry
    sys.modules.update({
        "timm": timm, "timm.data": data, "timm.models": models_m,
        "timm.models.layers": layers, "timm.models.helpers": helpers,
        "timm.models.resnet": resnet_m, "timm.models.registry": registry,
    })

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")

    class _StubResNet(nn.Module):
        pass

    def _vgg16(pretrained=False, **kw):
        """Structure-faithful torchvision vgg16 (cfg D) with random init —
        DSIFN only reads `.features`; golden tests convert whatever weights
        the instance carries, so pretrained values are irrelevant."""
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, cin = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers.append(nn.Conv2d(cin, v, 3, padding=1))
                layers.append(nn.ReLU(inplace=True))
                cin = v
        out = nn.Module()
        out.features = nn.Sequential(*layers)
        return out

    tvm.ResNet = _StubResNet
    tvm.vgg16 = _vgg16
    tv.models = tvm
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)

    gcn = types.ModuleType("gcn_lib")

    class _StubGrapher(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    gcn.Grapher = _StubGrapher
    gcn.act_layer = lambda *a, **k: nn.ReLU()
    sys.modules.setdefault("gcn_lib", gcn)


def load_ref_model_module(name: str):
    """Spec-load /root/reference/models/{name}.py as models.{name} without
    executing the models package __init__. Installs stubs first and patches
    the stub package with pretrained=False resnet constructors (BIT calls
    models.resnet18(pretrained=True); there is no weight egress here)."""
    install_ref_stubs()
    if ("models" not in sys.modules
            or not getattr(sys.modules["models"], "_stcd_stub", False)):
        pkg = types.ModuleType("models")
        pkg.__path__ = [REF]
        pkg._stcd_stub = True
        sys.modules["models"] = pkg
    pkg = sys.modules["models"]
    if name != "resnet" and not hasattr(pkg, "resnet18"):
        res = load_ref_model_module("resnet")
        for n in ("resnet18", "resnet34", "resnet50"):
            real = getattr(res, n)
            setattr(pkg, n,
                    (lambda real: lambda pretrained=True, **kw:
                     real(pretrained=False, **kw))(real))
    mod_name = f"models.{name}"
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    spec = importlib.util.spec_from_file_location(
        mod_name, os.path.join(REF, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_ref_smp_module(dotted: str):
    """Import a submodule of the reference's vendored
    segmentation_models_pytorch WITHOUT executing the top-level __init__
    (which needs timm/pretrainedmodels). Sub-packages like `base` are
    torch-only and import normally once the parent package is stubbed."""
    import importlib
    install_ref_stubs()
    root = "/root/reference/segmentation_models_pytorch"
    if ("segmentation_models_pytorch" not in sys.modules
            or not getattr(sys.modules["segmentation_models_pytorch"],
                           "_stcd_stub", False)):
        pkg = types.ModuleType("segmentation_models_pytorch")
        pkg.__path__ = [root]
        pkg._stcd_stub = True
        sys.modules["segmentation_models_pytorch"] = pkg
    return importlib.import_module(f"segmentation_models_pytorch.{dotted}")


def load_ref_smp_file(dotted: str):
    """Spec-load one FILE of the vendored smp (e.g.
    'decoders.fpn.decoder') without executing ANY package __init__ along
    the way (decoder __init__s import the encoder zoo, which needs
    torchvision/pretrainedmodels). Parent packages become path-stubs; the
    file's own `from segmentation_models_pytorch.base import ...` then
    resolves through load_ref_smp_module (base is torch-only)."""
    load_ref_smp_module("base")  # make the real base subpackage importable
    root = "/root/reference/segmentation_models_pytorch"
    parts = dotted.split(".")
    parent = "segmentation_models_pytorch"
    path = root
    for p in parts[:-1]:
        parent = f"{parent}.{p}"
        path = os.path.join(path, p)
        if parent not in sys.modules:
            pkg = types.ModuleType(parent)
            pkg.__path__ = [path]
            pkg._stcd_stub = True
            sys.modules[parent] = pkg
    mod_name = f"segmentation_models_pytorch.{dotted}"
    if mod_name in sys.modules:
        return sys.modules[mod_name]
    spec = importlib.util.spec_from_file_location(
        mod_name, os.path.join(path, parts[-1] + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[mod_name] = mod
    spec.loader.exec_module(mod)
    return mod


def install_ref_encoder_stub():
    """Install a stub ``segmentation_models_pytorch.encoders`` exposing a
    get_encoder backed by a torchvision-faithful resnet18 twin (torchvision
    itself is absent on this host), so the reference's OWN modified
    ``decoders/unet/model.py`` (UnetSeg/CDNet/SegCD/FFCTLCD, SURVEY §2.4 ★)
    loads and runs — its decoder/heads/init are the reference's real code;
    only the encoder graph is the twin (same graph torchvision builds,
    validated by test_convert.py::test_resnet18_forward_parity)."""
    import torch.nn as nn
    from test_convert import TVResNet18

    install_ref_stubs()
    name = "segmentation_models_pytorch.encoders"
    if name in sys.modules and hasattr(sys.modules[name], "get_encoder"):
        return sys.modules[name]
    # The module may already exist as a bare path-stub (load_ref_smp_file
    # creates one for any "encoders.X" load — test-order dependent): keep
    # it (its __path__ and loaded submodules) and attach get_encoder.

    class RefResNet18Encoder(TVResNet18):
        """torchvision graph + init (kaiming fan_out convs, BN 1/0) with
        the smp stage-contract attributes (ref encoders/resnet.py:37-70)."""

        out_channels = (3, 64, 64, 128, 256, 512)
        output_stride = 32

        def __init__(self):
            super().__init__()
            for m in self.modules():
                if isinstance(m, nn.Conv2d):
                    nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                            nonlinearity="relu")
                elif isinstance(m, nn.BatchNorm2d):
                    nn.init.constant_(m.weight, 1.0)
                    nn.init.constant_(m.bias, 0.0)

    def get_encoder(name, in_channels=3, depth=5, weights=None, **kw):
        assert (name, in_channels, depth, weights) == ("resnet18", 3, 5, None), \
            "encoder stub supports resnet18/in3/depth5/weights=None only"
        return RefResNet18Encoder()

    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod._stcd_stub = True
        # real __path__ so later load_ref_smp_file("encoders.X") calls (and
        # their relative imports) still resolve against the reference tree
        mod.__path__ = ["/root/reference/segmentation_models_pytorch/encoders"]
        sys.modules[name] = mod
    mod.get_encoder = get_encoder
    return mod


def load_ref_star_models():
    """The reference's modified decoders/unet/model.py (UnetSeg, CDNet,
    SegCD, FFCTLCD — the STCD paper's models) with the encoder stub."""
    install_ref_encoder_stub()
    return load_ref_smp_file("decoders.unet.model")


def load_ref_train_stcd():
    """Load /root/reference/train_stcd.py itself as a module, so golden
    tests and the convergence harness can call the reference's OWN stage-3
    loss apparatus: contrastive_loss (:334-385), BCE_DICE/Dice (:653-672),
    Poly (:563-580), SegmentationMetric (:515-560).

    The script imports heavy/absent deps at module level
    (pytorch_grad_cam, torchvision.utils, albumentations via
    data.dataset) and parses argv at import (:40-52) — all stubbed /
    patched here; every function of interest is pure torch.  Tensor.cuda
    is monkey-patched to a no-op (contrastive_loss allocates its M/N
    masks via ``torch.zeros(...).cuda()`` — CPU-only host)."""
    import torch

    if "ref_train_stcd" in sys.modules:
        return sys.modules["ref_train_stcd"]

    install_ref_stubs()
    load_ref_star_models()  # smp path-stubs + the real decoders.unet.model

    tv = sys.modules["torchvision"]
    if "torchvision.utils" not in sys.modules:
        tvu = types.ModuleType("torchvision.utils")
        tvu.save_image = lambda *a, **k: None
        tv.utils = tvu
        sys.modules["torchvision.utils"] = tvu

    if "pytorch_grad_cam" not in sys.modules:
        cam = types.ModuleType("pytorch_grad_cam")
        for nm in ("GradCAM", "ScoreCAM", "GradCAMPlusPlus", "AblationCAM",
                   "XGradCAM", "EigenCAM"):
            setattr(cam, nm, type(nm, (), {}))
        cam_utils = types.ModuleType("pytorch_grad_cam.utils")
        cam_img = types.ModuleType("pytorch_grad_cam.utils.image")
        for nm in ("show_cam_on_image", "deprocess_image",
                   "preprocess_image"):
            setattr(cam_img, nm, lambda *a, **k: None)
        cam.utils = cam_utils
        cam_utils.image = cam_img
        sys.modules.update({"pytorch_grad_cam": cam,
                            "pytorch_grad_cam.utils": cam_utils,
                            "pytorch_grad_cam.utils.image": cam_img})

    if "data.dataset" not in sys.modules:
        # the real data/dataset.py needs albumentations + torchvision
        # transforms; the train-loop functions under test never touch it
        d = types.ModuleType("data")
        d.__path__ = []
        dd = types.ModuleType("data.dataset")
        for nm in ("WHU_Dataset", "CD_Dataset", "FFC_Dataset", "SC_Dataset",
                   "PSE_Dataset", "LEVIR_Dataset"):
            setattr(dd, nm, type(nm, (), {}))
        d.dataset = dd
        sys.modules.update({"data": d, "data.dataset": dd})

    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [REF]
        pkg._stcd_stub = True
        sys.modules["models"] = pkg  # `import models.DSIFN` et al. load the
        # real reference files through this path (torch-only / stubbed tv)

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only host

    argv = sys.argv
    sys.argv = ["train_stcd.py"]  # module-level parse_args (:52)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_train_stcd", "/root/reference/train_stcd.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_train_stcd"] = mod
        spec.loader.exec_module(mod)
    finally:
        sys.argv = argv
    return mod
