#!/bin/bash
# Build an INSTRUMENTED reference binary (parity diagnostics only).
#
# Identical to build.sh except the /tmp copy additionally gets patched to
# dump, when the env var PLU_DUMP=<base> is set:
#   <base>.linear.f32 : (H, W, 3) f32 — the LINEAR accumulation buffer,
#                       written after render and BEFORE postprocess/tonemap
#                       (src/main.cpp:183) so radiometric comparisons skip
#                       the nonlinear tonemap entirely;
#   <base>.terms.f32  : (H, W, 3 terms, 8 bounces, 3) f32 — the integrator's
#                       radiance split by contribution site in
#                       renderer::ray_color (src/renderer.cpp:59-96):
#                         term 0 = emitted light at vertex  (renderer.cpp:66)
#                         term 1 = NEE light-strategy Ld    (renderer.cpp:17-26)
#                         term 2 = NEE BSDF-strategy Ld     (renderer.cpp:29-49)
#                       each multiplied by path_throughput, lights.size() and
#                       1/spp exactly as the real accumulation is.
# Accumulation is race-free the same way the framebuffer is: tiles own
# disjoint pixels. The out-of-bounds edge column (inc/sampler.h:75,85) is
# discarded rather than wrapped.
# Produces /tmp/refdump/plutracer — diagnostics only, never the parity oracle.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
REF=/root/reference
OUT=${1:-/tmp/refdump}
mkdir -p "$OUT"
rm -rf "$OUT/src_copy" "$OUT/src_copy_inc"
cp -r "$REF/inc" "$OUT/src_copy_inc"
cp -r "$REF/src" "$OUT/src_copy"
python3 - "$OUT/src_copy_inc/scene.h" <<'PY'
import sys
p = sys.argv[1]
src = open(p).read()
old = "auto ss = make_basic_surface(cx, cx.eval1(objvs[i + 1]).get<vector<urn::value>>(), j);"
new = ("auto ss_tmp = cx.eval1(objvs[i + 1]).get<vector<urn::value>>();\n"
       "\t\t\t\t\t\tauto ss = make_basic_surface(cx, ss_tmp, j);")
assert old in src, "patch target not found"
open(p, "w").write(src.replace(old, new))
PY
python3 - "$OUT/src_copy/renderer.cpp" "$OUT/src_copy/main.cpp" <<'PY'
import sys
rp, mp = sys.argv[1], sys.argv[2]

r = open(rp).read()

def rep(src, old, new, count=1):
    assert src.count(old) == count, (old, src.count(old))
    return src.replace(old, new)

# globals + accumulation helper (global namespace; cmmn.h re-exports glm)
r = rep(r, '#include "renderer.h"', '''#include "renderer.h"
#include <cstdlib>
#include <cstdio>
float* g_dump_terms = nullptr;
int g_dump_w = 0, g_dump_h = 0;
float g_smp_wgt = 0.f;
static const int PLU_NB = 8, PLU_NSLOT = 3 * PLU_NB;
thread_local float* t_term_px = nullptr;
thread_local glm::vec3 t_Ld_light, t_Ld_bsdf;
static inline void acc_term(int term, int bounce, glm::vec3 v) {
\tif (!t_term_px) return;
\tint b = bounce < PLU_NB ? bounce : PLU_NB - 1;
\tfloat* s = t_term_px + (term * PLU_NB + b) * 3;
\ts[0] += v.x * g_smp_wgt; s[1] += v.y * g_smp_wgt; s[2] += v.z * g_smp_wgt;
}''')

# estimate_direct_light: record the two MIS strategies
r = rep(r, '\t\tvec3 Ld;', '\t\tvec3 Ld; t_Ld_light = vec3(0.f); t_Ld_bsdf = vec3(0.f);')
r = rep(r, '\t\t//sample BSDF with multipule importance sampling',
        '\t\tt_Ld_light = Ld;\n\t\t//sample BSDF with multipule importance sampling')
r = rep(r, 'if (light_pdf == 0.f) return Ld;',
        'if (light_pdf == 0.f) { t_Ld_bsdf = Ld - t_Ld_light; return Ld; }')
r = rep(r, '\t\t}\n\t\treturn Ld;\n\t}',
        '\t\t}\n\t\tt_Ld_bsdf = Ld - t_Ld_light;\n\t\treturn Ld;\n\t}')

# ray_color: split the three accumulation sites
r = rep(r, 'if (bounces == 0 || spec_bounce) L += path_throughput * hr.surf->mat->Le(r(hr.t),hr.norm,-r.d);',
        'if (bounces == 0 || spec_bounce) { vec3 _le = path_throughput * hr.surf->mat->Le(r(hr.t),hr.norm,-r.d); L += _le; acc_term(0, bounces, _le); }')
r = rep(r, 'L += path_throughput * uniform_sample_one_light(smp, p, n, -r.d, bsdf);',
        '{ vec3 _dl = path_throughput * uniform_sample_one_light(smp, p, n, -r.d, bsdf); L += _dl; float _ls = (float)lights.size(); acc_term(1, bounces, path_throughput * t_Ld_light * _ls); acc_term(2, bounces, path_throughput * t_Ld_bsdf * _ls); }')

# render(): init dump buffer, point each sample at its pixel slot
r = rep(r, 'float smp_wgt = 1.f / (float)(main_sampler->sample_count.x*main_sampler->sample_count.y);',
        '''float smp_wgt = 1.f / (float)(main_sampler->sample_count.x*main_sampler->sample_count.y);
\t\tg_smp_wgt = smp_wgt;
\t\tif (getenv("PLU_DUMP") && !g_dump_terms) {
\t\t\tg_dump_w = target->size.x; g_dump_h = target->size.y;
\t\t\tg_dump_terms = (float*)calloc((size_t)g_dump_w * g_dump_h * PLU_NSLOT * 3, sizeof(float));
\t\t}''')
r = rep(r, '\t\t\t\t\t\tcam.generate_ray(r, s);',
        '''\t\t\t\t\t\tif (g_dump_terms) {
\t\t\t\t\t\t\tuvec2 _pc = uvec2(floor(s.px));
\t\t\t\t\t\t\tt_term_px = (_pc.x < (uint)g_dump_w && _pc.y < (uint)g_dump_h)
\t\t\t\t\t\t\t\t? g_dump_terms + ((size_t)_pc.x + (size_t)_pc.y * g_dump_w) * PLU_NSLOT * 3 : nullptr;
\t\t\t\t\t\t}
\t\t\t\t\t\tcam.generate_ray(r, s);''')
open(rp, 'w').write(r)

m = open(mp).read()
m = rep(m, '\tcout << "postprocessing... " << endl;', '''\tif (const char* _dp = getenv("PLU_DUMP")) {
\t\tstd::string _b(_dp);
\t\tFILE* _f = fopen((_b + ".linear.f32").c_str(), "wb");
\t\tfor (unsigned y = 0; y < tx->size.y; ++y) for (unsigned x = 0; x < tx->size.x; ++x) {
\t\t\tvec3 _p = tx->pixel(uvec2(x, y)); float _v[3] = {_p.x, _p.y, _p.z}; fwrite(_v, 4, 3, _f);
\t\t}
\t\tfclose(_f);
\t\textern float* g_dump_terms; extern int g_dump_w, g_dump_h;
\t\tif (g_dump_terms) {
\t\t\t_f = fopen((_b + ".terms.f32").c_str(), "wb");
\t\t\tfwrite(g_dump_terms, 4, (size_t)g_dump_w * g_dump_h * 24 * 3, _f);
\t\t\tfclose(_f);
\t\t}
\t}
\tcout << "postprocessing... " << endl;''')
open(mp, 'w').write(m)
print("instrumentation patches applied")
PY
g++ -O2 -std=c++14 -w -fpermissive \
    -I "$HERE/shims" -I "$OUT/src_copy_inc" \
    "$OUT"/src_copy/*.cpp "$OUT"/src_copy/surfaces/*.cpp \
    -o "$OUT/plutracer" -lpthread
rm -rf "$OUT/src_copy" "$OUT/src_copy_inc"
echo "built $OUT/plutracer (instrumented)"
