"""Compact torch mirrors of the reference architectures, used ONLY as test oracles.

These rebuild the reference graphs (cited per class) in independent, loop-heavy style
so converted checkpoints can be validated activation-for-activation without the
reference repo or its checkpoints. State-dict key names intentionally match the
reference models' names — that naming is the conversion contract under test.
"""
import torch
import torch.nn as nn
import torch.nn.functional as F


def randomize_bn_stats(model, seed=0):
    """Give every BN layer non-trivial running stats so eval-mode tests are meaningful."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
                m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.2)
    return model


# --- VUNet (vunet/models.py:17-485, vunet/layers.py:21-221) ------------------------
# Deployment config: up_mode='subpixel', w_norm=True, drop_prob (eval: inactive),
# vunet_256=True. `cov=0` in forwards disables sampler noise for determinism.


class TVMyConv(nn.Module):
    def __init__(self, cin, cout, k, s, p, wn=True):
        super().__init__()
        conv = nn.Conv2d(cin, cout, k, s, p, bias=True)
        self.conv = nn.utils.weight_norm(conv, dim=0) if wn else conv

    def forward(self, x, skip_in=None):
        if skip_in is not None:
            x = torch.cat([x, skip_in], 1)
        return self.conv(x)


class TVNiN(nn.Module):
    def __init__(self, cin, cout, wn=True):
        super().__init__()
        self.layers = nn.Sequential(nn.Identity(), TVMyConv(cin, cout, 1, 1, 0, wn))

    def forward(self, x):
        return self.layers[1](F.elu(x))


class TVResidual(nn.Module):
    def __init__(self, cin, cout, wn=True):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Identity(), nn.Identity(), TVMyConv(cin, cout, 3, 1, 1, wn)
        )

    def forward(self, x, skip_in=None):
        r = x
        if skip_in is not None:
            x = torch.cat([r, skip_in], 1)
        return self.layers[2](F.elu(x)) + r


class TVDown(nn.Module):
    def __init__(self, cin, cout, wn=True):
        super().__init__()
        self.down = TVMyConv(cin, cout, 3, 2, 1, wn)

    def forward(self, x):
        return self.down(x)


def _t_d2s(x, bs=2):
    import einops

    return einops.rearrange(x, "b (r1 r2 c) h w -> b c (h r1) (w r2)", r1=bs, r2=bs)


def _t_s2d(x, bs=2):
    import einops

    return einops.rearrange(x, "b c (h r1) (w r2) -> b (r1 r2 c) h w", r1=bs, r2=bs)


class TVUp(nn.Module):
    def __init__(self, cin, cout, wn=True):
        super().__init__()
        self.depth4x = TVMyConv(cin, 4 * cout, 3, 1, 1, wn)

    def forward(self, x, skip_in=None):
        if skip_in is not None:
            x = torch.cat([x, skip_in], 1)
        return _t_d2s(self.depth4x(x))


class TVSampler(nn.Module):
    def __init__(self, cin, cout, wn=True):
        super().__init__()
        self.conv = TVMyConv(cin, cout, 3, 1, 1, wn)

    def forward(self, x, cov=0.0):
        mu = self.conv(x)
        return mu, mu + torch.randn_like(mu) * cov


class TVInitBlock(nn.Module):
    def __init__(self, cin, cout, wn=True):
        super().__init__()
        self.nin = TVNiN(cin, cout, wn)
        self.residual_0 = TVResidual(cout, cout, wn)
        self.residual_1 = TVResidual(cout, cout, wn)

    def forward(self, x):
        x = self.nin(x)
        x = self.residual_0(x)
        s0 = x
        x = self.residual_1(x)
        return x, [s0, x]


class TVDownBlock(nn.Module):
    def __init__(self, cin, cout, wn=True):
        super().__init__()
        self.down = TVDown(cin, cout, wn)
        self.residual_0 = TVResidual(cout, cout, wn)
        self.residual_1 = TVResidual(cout, cout, wn)

    def forward(self, x):
        x = self.down(x)
        x = self.residual_0(x)
        s0 = x
        x = self.residual_1(x)
        return x, [s0, x]


class TVUpBlock(nn.Module):
    def __init__(self, cin, cmid, cout, wn=True):
        super().__init__()
        self.residual_0 = TVResidual(cin, cmid, wn)
        self.residual_1 = TVResidual(cin, cmid, wn)
        self.up = TVUp(cmid, cout, wn)

    def forward(self, x, skip_a, skip_b):
        return self.up(self.residual_1(self.residual_0(x, skip_a), skip_b))


class TVEndBlock(nn.Module):
    def __init__(self, cin, cmid, cout, wn=True):
        super().__init__()
        self.residual_0 = TVResidual(cin, cmid, wn)
        self.residual_1 = TVResidual(cin, cmid, wn)
        self.conv = TVMyConv(cmid, cout, 3, 1, 1, wn)

    def forward(self, x, skip_a, skip_b):
        return self.conv(self.residual_1(self.residual_0(x, skip_a), skip_b))


class TVARBlock(nn.Module):
    def __init__(self, wn=True):
        super().__init__()
        self.residual_init = TVResidual(256, 128, wn)
        self.residual_s2d = TVResidual(128, 128, wn)
        for i in range(4):
            self.add_module(f"sampler_{i}", TVSampler(512, 128, wn))
        for i in range(3):
            self.add_module(f"residual_{i}", TVResidual(1024, 512, wn))
            self.add_module(f"nin_{i}", TVNiN(128, 512, wn))

    def forward(self, x, skip_a, enc_down_mu=None):
        x = self.residual_init(x, skip_a)
        x_ = _t_s2d(self.residual_s2d(x))
        if enc_down_mu is not None:
            g = [
                getattr(self, f"nin_{i}")(t)
                for i, t in enumerate(torch.split(_t_s2d(enc_down_mu), 128, 1)[:3])
            ]
        mus, zs = [], []
        for i in range(4):
            mu_i, z_i = getattr(self, f"sampler_{i}")(x_)
            mus.append(mu_i)
            zs.append(z_i)
            if i < 3:
                skip = g[i] if enc_down_mu is not None else getattr(self, f"nin_{i}")(z_i)
                x_ = getattr(self, f"residual_{i}")(x_, skip)
        return x, _t_d2s(torch.cat(mus, 1)), _t_d2s(torch.cat(zs, 1))


class TVunet(nn.Module):
    def __init__(self, vunet_256=True, wn=True):
        super().__init__()
        self.vunet_256 = vunet_256
        self.app_encoder_1 = TVInitBlock(6, 128, wn)
        self.app_encoder_1_a = TVDownBlock(128, 128, wn)
        self.app_encoder_1_b = TVDownBlock(128, 128, wn)
        if vunet_256:
            self.app_encoder_1_c = TVDownBlock(128, 128, wn)
        self.app_encoder_2 = TVDownBlock(128, 128, wn)
        self.app_encoder_3 = TVDownBlock(128, 128, wn)
        self.app_encoder_4 = TVDownBlock(128, 128, wn)
        self.app_skip_3_c = TVNiN(128, 128, wn)
        self.app_skip_4_c = TVNiN(128, 128, wn)
        self.app_bottleneck = TVMyConv(128, 128, 1, 1, 0, wn)
        self.app_decoder_1_a = TVResidual(256, 128, wn)
        self.app_decoder_1_b = TVSampler(128, 128, wn)
        self.app_decoder_1_c = TVMyConv(256, 128, 1, 1, 0, wn)
        self.app_decoder_1_d = TVResidual(256, 128, wn)
        self.app_decoder_1_e = TVUp(128, 128, wn)
        self.app_decoder_2_a = TVResidual(128, 128, wn)
        self.app_decoder_2_b = TVSampler(128, 128, wn)
        self.shape_encoder_1 = TVInitBlock(3, 32, wn)
        if vunet_256:
            self.shape_encoder_1_a = TVDownBlock(32, 32, wn)
            self.shape_skip_1_a_b = TVNiN(32, 32, wn)
            self.shape_skip_1_a_c = TVNiN(32, 32, wn)
        self.shape_encoder_2 = TVDownBlock(32, 64, wn)
        self.shape_encoder_3 = TVDownBlock(64, 128, wn)
        self.shape_encoder_4 = TVDownBlock(128, 128, wn)
        self.shape_encoder_5 = TVDownBlock(128, 128, wn)
        self.shape_encoder_6 = TVDownBlock(128, 128, wn)
        self.shape_skip_1_b = TVNiN(32, 32, wn)
        self.shape_skip_1_c = TVNiN(32, 32, wn)
        self.shape_skip_2_b = TVNiN(64, 64, wn)
        self.shape_skip_2_c = TVNiN(64, 64, wn)
        for i in (3, 4, 5, 6):
            self.add_module(f"shape_skip_{i}_b", TVNiN(128, 128, wn))
            self.add_module(f"shape_skip_{i}_c", TVNiN(128, 128, wn))
        self.shape_bottleneck = TVMyConv(128, 128, 1, 1, 0, wn)
        self.shape_decoder_1 = TVARBlock(wn)
        self.shape_decoder_1_n = TVNiN(256, 128, wn)
        self.shape_decoder_1_o = TVResidual(256, 128, wn)
        self.shape_decoder_1_p = TVUp(128, 128, wn)
        self.shape_decoder_2 = TVARBlock(wn)
        self.shape_decoder_2_n = TVNiN(256, 128, wn)
        self.shape_decoder_2_o = TVResidual(256, 128, wn)
        self.shape_decoder_2_p = TVUp(128, 128, wn)
        self.shape_decoder_3 = TVUpBlock(256, 128, 128, wn)
        self.shape_decoder_4 = TVUpBlock(256, 128, 64, wn)
        self.shape_decoder_5 = TVUpBlock(128, 64, 32, wn)
        if vunet_256:
            self.shape_decoder_5_a = TVUpBlock(64, 32, 32, wn)
        self.shape_decoder_6 = TVEndBlock(64, 32, 3, wn)

    def forward_enc_up(self, x):
        skips = []
        x, _ = self.app_encoder_1(x)
        x, _ = self.app_encoder_1_a(x)
        x, _ = self.app_encoder_1_b(x)
        if self.vunet_256:
            x, _ = self.app_encoder_1_c(x)
        x, _ = self.app_encoder_2(x)
        x, _ = self.app_encoder_3(x)
        skips.append(self.app_skip_3_c(x))
        x, sl = self.app_encoder_4(x)
        outputs = [sl[-2], x]
        skips.append(self.app_skip_4_c(x))
        return outputs, skips

    def forward_enc_down(self, outputs, skips):
        x = self.app_bottleneck(outputs[-1])
        x = self.app_decoder_1_a(x, skips[-1])
        mu_0, z_0 = self.app_decoder_1_b(x)
        x_ = self.app_decoder_1_c(torch.cat([outputs[-2], z_0], 1))
        x = self.app_decoder_1_d(x, x_)
        x = self.app_decoder_1_e(x)
        x = self.app_decoder_2_a(x, None)
        mu_1, z_1 = self.app_decoder_2_b(x)
        return [mu_0, mu_1], [z_0, z_1]

    def forward_dec_up(self, y):
        skips = []
        x, sl = self.shape_encoder_1(y)
        skips += [self.shape_skip_1_b(sl[-2]), self.shape_skip_1_c(sl[-1])]
        if self.vunet_256:
            x, sl = self.shape_encoder_1_a(x)
            skips += [self.shape_skip_1_a_b(sl[-2]), self.shape_skip_1_a_c(sl[-1])]
        for i in (2, 3, 4, 5, 6):
            x, sl = getattr(self, f"shape_encoder_{i}")(x)
            skips += [
                getattr(self, f"shape_skip_{i}_b")(sl[-2]),
                getattr(self, f"shape_skip_{i}_c")(sl[-1]),
            ]
        return [x], skips

    def forward_dec_down(self, outputs, skips, enc_down_mu=()):
        skips = list(skips)
        x = self.shape_bottleneck(outputs[-1])
        skip_a, skip_b = skips.pop(), skips.pop()
        mu_a = None if len(enc_down_mu) == 0 else enc_down_mu[0]
        x, mu_0, z_0 = self.shape_decoder_1(x, skip_a, mu_a)
        x = self.shape_decoder_1_n(torch.cat([x, z_0], 1))
        x = self.shape_decoder_1_o(x, skip_b)
        x = self.shape_decoder_1_p(x)
        skip_a, skip_b = skips.pop(), skips.pop()
        mu_a = None if len(enc_down_mu) == 0 else enc_down_mu[1]
        x, mu_1, z_1 = self.shape_decoder_2(x, skip_a, mu_a)
        x = self.shape_decoder_2_n(torch.cat([x, z_1], 1))
        x = self.shape_decoder_2_o(x, skip_b)
        x = self.shape_decoder_2_p(x)
        x = self.shape_decoder_3(x, skips.pop(), skips.pop())
        x = self.shape_decoder_4(x, skips.pop(), skips.pop())
        x = self.shape_decoder_5(x, skips.pop(), skips.pop())
        if self.vunet_256:
            x = self.shape_decoder_5_a(x, skips.pop(), skips.pop())
        x = self.shape_decoder_6(x, skips.pop(), skips.pop())
        assert not skips
        return x, [mu_0, mu_1], [z_0, z_1]


# --- VGG19 (torchvision config E; used by run_test.py:45-58, edgeconnect/loss.py) --


def t_vgg19(num_classes=1000):
    """torchvision-compatible vgg19 (state-dict keys features.N / classifier.N)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    feats, cin = [], 3
    for v in cfg:
        if v == "M":
            feats.append(nn.MaxPool2d(2, 2))
        else:
            feats += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU(True)]
            cin = v

    class TVGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*feats)
            self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
            self.classifier = nn.Sequential(
                nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
                nn.Linear(4096, num_classes),
            )

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return TVGG()


# --- EdgeConnect (edgeconnect/networks.py:37-210) ----------------------------------


def _sn(mod, use=True):
    return nn.utils.spectral_norm(mod) if use else mod


class TECResBlock(nn.Module):
    def __init__(self, dim, dilation=1, use_sn=False):
        super().__init__()
        self.conv_block = nn.Sequential(
            nn.ReflectionPad2d(dilation),
            _sn(nn.Conv2d(dim, dim, 3, dilation=dilation, bias=not use_sn), use_sn),
            nn.InstanceNorm2d(dim, track_running_stats=False),
            nn.ReLU(True),
            nn.ReflectionPad2d(1),
            _sn(nn.Conv2d(dim, dim, 3, bias=not use_sn), use_sn),
            nn.InstanceNorm2d(dim, track_running_stats=False),
        )

    def forward(self, x):
        return x + self.conv_block(x)


def _t_ec_generator(cin, cout, use_sn, blocks=8):
    class G(nn.Module):
        def __init__(self):
            super().__init__()
            inorm = lambda c: nn.InstanceNorm2d(c, track_running_stats=False)  # noqa: E731
            self.encoder = nn.Sequential(
                nn.ReflectionPad2d(3),
                _sn(nn.Conv2d(cin, 64, 7), use_sn), inorm(64), nn.ReLU(True),
                _sn(nn.Conv2d(64, 128, 4, 2, 1), use_sn), inorm(128), nn.ReLU(True),
                _sn(nn.Conv2d(128, 256, 4, 2, 1), use_sn), inorm(256), nn.ReLU(True),
            )
            self.middle = nn.Sequential(*[TECResBlock(256, 2, use_sn) for _ in range(blocks)])
            self.decoder = nn.Sequential(
                _sn(nn.ConvTranspose2d(256, 128, 4, 2, 1), use_sn), inorm(128), nn.ReLU(True),
                _sn(nn.ConvTranspose2d(128, 64, 4, 2, 1), use_sn), inorm(64), nn.ReLU(True),
                nn.ReflectionPad2d(3),
                nn.Conv2d(64, cout, 7),
            )

        def forward(self, x):
            x = self.decoder(self.middle(self.encoder(x)))
            return torch.sigmoid(x) if cout == 1 else (torch.tanh(x) + 1) / 2

    return G()


class TECDiscriminator(nn.Module):
    def __init__(self, cin, use_sigmoid=True, use_sn=True):
        super().__init__()
        self.use_sigmoid = use_sigmoid
        chans = [(cin, 64, 2), (64, 128, 2), (128, 256, 2), (256, 512, 1), (512, 1, 1)]
        for i, (a, b, s) in enumerate(chans, 1):
            self.add_module(
                f"conv{i}",
                nn.Sequential(
                    _sn(nn.Conv2d(a, b, 4, s, 1, bias=not use_sn), use_sn),
                    *([nn.LeakyReLU(0.2, True)] if i < 5 else []),
                ),
            )

    def forward(self, x):
        feats = []
        for i in range(1, 6):
            x = getattr(self, f"conv{i}")(x)
            feats.append(x)
        out = torch.sigmoid(x) if self.use_sigmoid else x
        return out, feats


# --- stacked hourglass (stacked_hourglass/models.py:5-167) -------------------------


class THGBottleneck(nn.Module):
    expansion = 2

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.bn1, self.conv1 = nn.BatchNorm2d(cin), nn.Conv2d(cin, planes, 1)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1)
        self.bn3 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 2, 1)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        out = self.conv1(F.relu(self.bn1(x)))
        out = self.conv2(F.relu(self.bn2(out)))
        out = self.conv3(F.relu(self.bn3(out)))
        return out + r


class THourglass(nn.Module):
    def __init__(self, planes=128, depth=4, num_blocks=1):
        super().__init__()
        self.depth = depth
        hg = []
        for i in range(depth):
            branches = [
                nn.Sequential(*[THGBottleneck(planes * 2, planes) for _ in range(num_blocks)])
                for _ in range(4 if i == 0 else 3)
            ]
            hg.append(nn.ModuleList(branches))
        self.hg = nn.ModuleList(hg)

    def _fwd(self, n, x):
        up1 = self.hg[n - 1][0](x)
        low1 = self.hg[n - 1][1](F.max_pool2d(x, 2, 2))
        if n > 1:
            low2, feats = self._fwd(n - 1, low1)
        else:
            feats = self.hg[n - 1][3](low1)
            low2 = feats
        low3 = self.hg[n - 1][2](low2)
        return up1 + F.interpolate(low3, scale_factor=2), feats

    def forward(self, x):
        return self._fwd(self.depth, x)


# --- ICN / Warp&Learn (warp_learn/models.py:15-259) --------------------------------


class TWLLayerNorm(nn.Module):
    def __init__(self, num_features, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.gamma = nn.Parameter(torch.Tensor(num_features).uniform_())
        self.beta = nn.Parameter(torch.zeros(num_features))

    def forward(self, x):
        shape = [-1] + [1] * (x.dim() - 1)
        mean = x.view(x.size(0), -1).mean(1).view(*shape)
        std = x.view(x.size(0), -1).std(1).view(*shape)
        x = (x - mean) / (std + self.eps)
        shape = [1, -1] + [1] * (x.dim() - 2)
        return x * self.gamma.view(*shape) + self.beta.view(*shape)


def _t_conv_block(cin, cout, k, s, p, norm="none", act="relu", pad="zero"):
    mods = {"conv": nn.Conv2d(cin, cout, k, s, bias=True)}
    pad_mod = nn.ReflectionPad2d(p) if pad == "reflect" else nn.ZeroPad2d(p)
    norm_mod = {
        "inst": lambda: nn.InstanceNorm2d(cout, track_running_stats=False),
        "ln": lambda: TWLLayerNorm(cout),
        "none": lambda: None,
    }[norm]()
    act_mod = {"relu": nn.ReLU(True), "tanh": nn.Tanh(), "none": None}[act]

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.pad_mod = pad_mod
            self.conv = mods["conv"]
            if norm_mod is not None:
                self.norm = norm_mod
            self.act_mod = act_mod

        def forward(self, x):
            x = self.conv(self.pad_mod(x))
            if norm_mod is not None:
                x = self.norm(x)
            if self.act_mod is not None:
                x = self.act_mod(x)
            return x

    return Block()


class TResBlock(nn.Module):
    def __init__(self, dim, norm, act, pad):
        super().__init__()
        self.model = nn.Sequential(
            _t_conv_block(dim, dim, 3, 1, 1, norm, act, pad),
            _t_conv_block(dim, dim, 3, 1, 1, norm, "none", pad),
        )

    def forward(self, x):
        return x + self.model(x)


class TGResnet(nn.Module):
    def __init__(self, input_nc=21, output_nc=3, num_downs=2, n_res=3, ngf=64):
        super().__init__()
        enc = [_t_conv_block(input_nc, ngf, 7, 1, 3, "inst", "relu", "reflect")]
        dim = ngf
        for _ in range(num_downs):
            enc.append(_t_conv_block(dim, 2 * dim, 4, 2, 1, "inst", "relu", "reflect"))
            dim *= 2
        class _Seq(nn.Module):
            # Matches the reference's ResBlocks/ContentEncoder/Decoder which all hold
            # their layers in a `.model` Sequential — key paths like model.3.model.0.
            def __init__(self, mods):
                super().__init__()
                self.model = nn.Sequential(*mods)

            def forward(self, x):
                return self.model(x)

        enc.append(_Seq([TResBlock(dim, "inst", "relu", "reflect") for _ in range(n_res)]))
        self.enc_content = _Seq(enc)
        dec = [_Seq([TResBlock(dim, "inst", "relu", "reflect") for _ in range(n_res)])]
        for _ in range(num_downs):
            dec.append(nn.Upsample(scale_factor=2))
            dec.append(_t_conv_block(dim, dim // 2, 5, 1, 2, "ln", "relu", "reflect"))
            dim //= 2
        dec.append(_t_conv_block(dim, output_nc, 7, 1, 3, "none", "tanh", "reflect"))
        self.dec = _Seq(dec)

    def forward(self, x):
        return self.dec(self.enc_content(x))


class TDMulti(nn.Module):
    def __init__(self, input_nc=3, ndf=64, n_layers=2, num_D=2):
        super().__init__()
        self.num_D = num_D
        for i in range(num_D):
            ndf_i = int(round(ndf / (2**i)))
            seq = [nn.Conv2d(input_nc, ndf_i, 4, 2, 1), nn.LeakyReLU(0.2, True)]
            nf = 1
            for n in range(1, n_layers):
                nf_prev, nf = nf, min(2**n, 8)
                seq += [
                    nn.Conv2d(ndf_i * nf_prev, ndf_i * nf, 4, 2, 1),
                    nn.InstanceNorm2d(ndf_i * nf),
                    nn.LeakyReLU(0.2, True),
                ]
            nf_prev, nf = nf, min(2**n_layers, 8)
            seq += [
                nn.Conv2d(ndf_i * nf_prev, ndf_i * nf, 4, 1, 1),
                nn.InstanceNorm2d(ndf_i * nf),
                nn.LeakyReLU(0.2, True),
                nn.Conv2d(ndf_i * nf, 1, 4, 1, 1),
            ]
            self.add_module(f"model_{i}", nn.Sequential(*seq))
        self.down = nn.AvgPool2d(3, stride=2, padding=[1, 1], count_include_pad=False)

    def forward(self, x):
        out = []
        for i in range(self.num_D):
            out.append(getattr(self, f"model_{i}")(x))
            if i != self.num_D - 1:
                x = self.down(x)
        return out


class THourglassNet(nn.Module):
    def __init__(self, num_stacks=2, num_blocks=1, num_classes=12):
        super().__init__()
        self.num_stacks = num_stacks
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(
            THGBottleneck(64, 64, downsample=nn.Sequential(nn.Conv2d(64, 128, 1)))
        )
        self.layer2 = nn.Sequential(
            THGBottleneck(128, 128, downsample=nn.Sequential(nn.Conv2d(128, 256, 1)))
        )
        self.layer3 = nn.Sequential(THGBottleneck(256, 128))
        ch = 256
        self.hg = nn.ModuleList([THourglass(128, 4, num_blocks) for _ in range(num_stacks)])
        self.res = nn.ModuleList(
            [nn.Sequential(*[THGBottleneck(ch, 128) for _ in range(num_blocks)]) for _ in range(num_stacks)]
        )
        self.fc = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(ch, ch, 1), nn.BatchNorm2d(ch), nn.ReLU(True)) for _ in range(num_stacks)]
        )
        self.score = nn.ModuleList([nn.Conv2d(ch, num_classes, 1) for _ in range(num_stacks)])
        self.fc_ = nn.ModuleList([nn.Conv2d(ch, ch, 1) for _ in range(num_stacks - 1)])
        self.score_ = nn.ModuleList([nn.Conv2d(num_classes, ch, 1) for _ in range(num_stacks - 1)])

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.layer1(x)
        x = F.max_pool2d(x, 2, 2)
        x = self.layer2(x)
        x = self.layer3(x)
        heatmaps = []
        for i in range(self.num_stacks):
            y, _ = self.hg[i](x)
            y = self.fc[i](self.res[i](y))
            score = self.score[i](y)
            heatmaps.append(score)
            if i < self.num_stacks - 1:
                x = x + self.fc_[i](y) + self.score_[i](score)
        return heatmaps
