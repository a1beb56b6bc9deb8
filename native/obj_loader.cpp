// Native OBJ triangle-mesh loader with the same record support as the
// Python loader (plutracer_tpu/scene/obj.py) and the reference's hand-rolled
// parser (inc/scene.h:138-201): v / vn / vt / f with 1-based p, p/t, p//n,
// p/t/n face corners; comments and unknown records skipped.
//
// C ABI:
//   plu_load_obj(path, &pos, &norm, &uv, &nfaces) -> 0 | negative errno-ish
//     pos:  nfaces*3*3 floats (malloc'd; free with plu_free)
//     norm: nfaces*3*3 floats
//     uv:   nfaces*3*2 floats
//   plu_free(ptr)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Corner {
  int p = -1, t = -1, n = -1;
};

bool parse_corner(const char* s, Corner* c) {
  // formats: "p", "p/t", "p//n", "p/t/n" (1-based)
  char* end;
  long p = strtol(s, &end, 10);
  if (end == s) return false;
  c->p = static_cast<int>(p) - 1;
  if (*end != '/') return true;
  ++end;
  if (*end != '/') {
    long t = strtol(end, &end, 10);
    c->t = static_cast<int>(t) - 1;
  }
  if (*end == '/') {
    ++end;
    long n = strtol(end, &end, 10);
    c->n = static_cast<int>(n) - 1;
  }
  return true;
}

}  // namespace

extern "C" void plu_free(void* p) { free(p); }

extern "C" int plu_load_obj(const char* path, float** out_pos,
                            float** out_norm, float** out_uv,
                            int* out_faces) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;

  std::vector<float> pos, norm, uv;
  std::vector<Corner> corners;  // 3 per face
  char line[4096];

  while (fgets(line, sizeof(line), f)) {
    char* s = line;
    while (*s == ' ' || *s == '\t') ++s;
    if (s[0] == '#' || s[0] == '\n' || s[0] == '\0') continue;
    if (s[0] == 'v' && s[1] == ' ') {
      float x, y, z;
      if (sscanf(s + 2, "%f %f %f", &x, &y, &z) == 3) {
        pos.push_back(x);
        pos.push_back(y);
        pos.push_back(z);
      }
    } else if (s[0] == 'v' && s[1] == 'n' && s[2] == ' ') {
      float x, y, z;
      if (sscanf(s + 3, "%f %f %f", &x, &y, &z) == 3) {
        norm.push_back(x);
        norm.push_back(y);
        norm.push_back(z);
      }
    } else if (s[0] == 'v' && s[1] == 't' && s[2] == ' ') {
      float u, v;
      if (sscanf(s + 3, "%f %f", &u, &v) == 2) {
        uv.push_back(u);
        uv.push_back(v);
      }
    } else if (s[0] == 'f' && s[1] == ' ') {
      char* tok = strtok(s + 2, " \t\r\n");
      Corner cs[3];
      int n = 0;
      while (tok && n < 3) {
        if (!parse_corner(tok, &cs[n])) break;
        ++n;
        tok = strtok(nullptr, " \t\r\n");
      }
      if (n == 3) {
        corners.push_back(cs[0]);
        corners.push_back(cs[1]);
        corners.push_back(cs[2]);
      }
    }
  }
  fclose(f);

  int F = static_cast<int>(corners.size() / 3);
  float* fpos = static_cast<float*>(calloc((size_t)F * 9, sizeof(float)));
  float* fnorm = static_cast<float*>(calloc((size_t)F * 9, sizeof(float)));
  float* fuv = static_cast<float*>(calloc((size_t)F * 6, sizeof(float)));
  if (!fpos || !fnorm || !fuv) {
    free(fpos);
    free(fnorm);
    free(fuv);
    return -2;
  }

  int nv = static_cast<int>(pos.size() / 3);
  int nn = static_cast<int>(norm.size() / 3);
  int nt = static_cast<int>(uv.size() / 2);
  for (int i = 0; i < F * 3; ++i) {
    const Corner& c = corners[i];
    if (c.p >= 0 && c.p < nv) memcpy(fpos + i * 3, &pos[c.p * 3], 12);
    if (c.n >= 0 && c.n < nn) memcpy(fnorm + i * 3, &norm[c.n * 3], 12);
    if (c.t >= 0 && c.t < nt) memcpy(fuv + i * 2, &uv[c.t * 2], 8);
  }

  *out_pos = fpos;
  *out_norm = fnorm;
  *out_uv = fuv;
  *out_faces = F;
  return 0;
}
