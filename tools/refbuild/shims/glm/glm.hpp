// Minimal from-scratch glm-compatible shim: just enough vector math to
// compile the reference renderer as a correctness oracle (the real glm
// submodule is not vendored in the read-only mount). Written for this
// project; standard vector-math boilerplate, not derived from glm sources.
#pragma once

#include <cfloat>
#include <cassert>
#include <cstring>
#include <malloc.h>
#include <cmath>
#include <cstdint>
#include <iostream>

typedef std::uint64_t uint64;
typedef unsigned int uint;

namespace glm {

struct vec2;
struct vec3;
struct vec4;
struct uvec2;

// ---------------- vec2 ----------------
struct vec2 {
  float x = 0.f, y = 0.f;
  vec2() = default;
  explicit vec2(float v) : x(v), y(v) {}
  vec2(float X, float Y) : x(X), y(Y) {}
  vec2(const uvec2& u);
  float& operator[](int i) { return (&x)[i]; }
  float operator[](int i) const { return (&x)[i]; }
  vec2& operator+=(const vec2& o) { x += o.x; y += o.y; return *this; }
  vec2& operator-=(const vec2& o) { x -= o.x; y -= o.y; return *this; }
  vec2& operator*=(float s) { x *= s; y *= s; return *this; }
  vec2& operator*=(const vec2& o) { x *= o.x; y *= o.y; return *this; }
};
inline vec2 operator+(vec2 a, const vec2& b) { return a += b; }
inline vec2 operator-(vec2 a, const vec2& b) { return a -= b; }
inline vec2 operator-(const vec2& a) { return vec2(-a.x, -a.y); }
inline vec2 operator*(vec2 a, const vec2& b) { return a *= b; }
inline vec2 operator*(vec2 a, float s) { return a *= s; }
inline vec2 operator*(float s, vec2 a) { return a *= s; }
inline vec2 operator/(const vec2& a, const vec2& b) { return vec2(a.x / b.x, a.y / b.y); }
inline vec2 operator/(const vec2& a, float s) { return vec2(a.x / s, a.y / s); }
inline vec2 operator/(float s, const vec2& a) { return vec2(s / a.x, s / a.y); }
inline vec2 operator-(float s, const vec2& a) { return vec2(s - a.x, s - a.y); }
inline vec2 operator+(float s, const vec2& a) { return vec2(s + a.x, s + a.y); }
inline vec2 operator-(const vec2& a, float s) { return vec2(a.x - s, a.y - s); }
inline vec2 operator+(const vec2& a, float s) { return vec2(a.x + s, a.y + s); }
inline bool operator==(const vec2& a, const vec2& b) { return a.x == b.x && a.y == b.y; }
inline bool operator!=(const vec2& a, const vec2& b) { return !(a == b); }

// ---------------- uvec2 ----------------
struct uvec2 {
  unsigned x = 0, y = 0;
  uvec2() = default;
  explicit uvec2(unsigned v) : x(v), y(v) {}
  uvec2(unsigned X, unsigned Y) : x(X), y(Y) {}
  uvec2(int X, int Y) : x((unsigned)X), y((unsigned)Y) {}
  uvec2(long X, long Y) : x((unsigned)X), y((unsigned)Y) {}
  uvec2(long long X, long long Y) : x((unsigned)X), y((unsigned)Y) {}
  uvec2(const vec2& v) : x((unsigned)v.x), y((unsigned)v.y) {}
  unsigned& operator[](int i) { return (&x)[i]; }
  unsigned operator[](int i) const { return (&x)[i]; }
};
inline uvec2 operator+(const uvec2& a, const uvec2& b) { return uvec2(a.x + b.x, a.y + b.y); }
inline vec2::vec2(const uvec2& u) : x((float)u.x), y((float)u.y) {}

// swizzle proxies overlaying vec3/vec4 storage (anonymous-union technique)
struct sw_xy {
  float d[2];
  operator vec2() const { return vec2(d[0], d[1]); }
  sw_xy& operator+=(const vec2& v) { d[0] += v.x; d[1] += v.y; return *this; }
};

// ---------------- vec3 ----------------
struct vec3 {
  union {
    struct { float x, y, z; };
    struct { float r, g, b; };
    sw_xy xy;
    float data_[3];
  };
  vec3() : x(0.f), y(0.f), z(0.f) {}
  explicit vec3(float v) : x(v), y(v), z(v) {}
  vec3(float X, float Y, float Z) : x(X), y(Y), z(Z) {}
  vec3(const vec2& v, float Z) : x(v.x), y(v.y), z(Z) {}
  float& operator[](int i) { return data_[i]; }
  float operator[](int i) const { return data_[i]; }
  vec3& operator+=(const vec3& o) { x += o.x; y += o.y; z += o.z; return *this; }
  vec3& operator-=(const vec3& o) { x -= o.x; y -= o.y; z -= o.z; return *this; }
  vec3& operator*=(const vec3& o) { x *= o.x; y *= o.y; z *= o.z; return *this; }
  vec3& operator*=(float s) { x *= s; y *= s; z *= s; return *this; }
  vec3& operator/=(float s) { x /= s; y /= s; z /= s; return *this; }
};
inline vec3 operator+(vec3 a, const vec3& b) { return a += b; }
inline vec3 operator-(vec3 a, const vec3& b) { return a -= b; }
inline vec3 operator-(const vec3& a) { return vec3(-a.x, -a.y, -a.z); }
inline vec3 operator*(vec3 a, const vec3& b) { return a *= b; }
inline vec3 operator*(vec3 a, float s) { return a *= s; }
inline vec3 operator*(float s, vec3 a) { return a *= s; }
inline vec3 operator/(const vec3& a, const vec3& b) { return vec3(a.x / b.x, a.y / b.y, a.z / b.z); }
inline vec3 operator/(const vec3& a, float s) { return vec3(a.x / s, a.y / s, a.z / s); }
inline vec3 operator/(float s, const vec3& a) { return vec3(s / a.x, s / a.y, s / a.z); }
inline vec3 operator+(const vec3& a, float s) { return vec3(a.x + s, a.y + s, a.z + s); }
inline vec3 operator+(float s, const vec3& a) { return a + s; }
inline vec3 operator-(const vec3& a, float s) { return vec3(a.x - s, a.y - s, a.z - s); }
inline vec3 operator-(float s, const vec3& a) { return vec3(s - a.x, s - a.y, s - a.z); }
inline bool operator==(const vec3& a, const vec3& b) { return a.x == b.x && a.y == b.y && a.z == b.z; }
inline bool operator!=(const vec3& a, const vec3& b) { return !(a == b); }
inline std::ostream& operator<<(std::ostream& os, const vec3& v) {
  return os << "[" << v.x << ", " << v.y << ", " << v.z << "]";
}

struct sw_xyz {
  float d[4];
  operator vec3() const { return vec3(d[0], d[1], d[2]); }
};

// ---------------- vec4 ----------------
struct vec4 {
  union {
    struct { float x, y, z, w; };
    sw_xyz xyz;
    sw_xy xy;
    float data_[4];
  };
  vec4() : x(0.f), y(0.f), z(0.f), w(0.f) {}
  vec4(float X, float Y, float Z, float W) : x(X), y(Y), z(Z), w(W) {}
  vec4(const vec3& v, float W) : x(v.x), y(v.y), z(v.z), w(W) {}
  vec4(const vec2& v, float Z, float W) : x(v.x), y(v.y), z(Z), w(W) {}
  float& operator[](int i) { return data_[i]; }
  float operator[](int i) const { return data_[i]; }
};

// ---------------- mat4 (column-major, like glm) ----------------
struct mat4 {
  vec4 c[4];
  mat4() {}
  explicit mat4(float d) {
    c[0] = vec4(d, 0, 0, 0);
    c[1] = vec4(0, d, 0, 0);
    c[2] = vec4(0, 0, d, 0);
    c[3] = vec4(0, 0, 0, d);
  }
  vec4& operator[](int i) { return c[i]; }
  const vec4& operator[](int i) const { return c[i]; }
};
inline vec4 operator*(const mat4& m, const vec4& v) {
  vec4 r(0, 0, 0, 0);
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) r[i] += m[j][i] * v[j];
  return r;
}

// ---------------- functions ----------------
inline float dot(const vec2& a, const vec2& b) { return a.x * b.x + a.y * b.y; }
inline float dot(const vec3& a, const vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline float length(const vec2& a) { return std::sqrt(dot(a, a)); }
inline float length(const vec3& a) { return std::sqrt(dot(a, a)); }
inline float distance(const vec3& a, const vec3& b) { return length(a - b); }
inline vec2 normalize(const vec2& a) { return a / length(a); }
inline vec3 normalize(const vec3& a) { return a / length(a); }
inline vec3 cross(const vec3& a, const vec3& b) {
  return vec3(a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x);
}
inline float min(float a, float b) { return a < b ? a : b; }
inline float max(float a, float b) { return a > b ? a : b; }
inline vec2 min(const vec2& a, const vec2& b) { return vec2(min(a.x, b.x), min(a.y, b.y)); }
inline vec2 max(const vec2& a, const vec2& b) { return vec2(max(a.x, b.x), max(a.y, b.y)); }
inline vec3 min(const vec3& a, const vec3& b) { return vec3(min(a.x, b.x), min(a.y, b.y), min(a.z, b.z)); }
inline vec3 max(const vec3& a, const vec3& b) { return vec3(max(a.x, b.x), max(a.y, b.y), max(a.z, b.z)); }
inline float clamp(float v, float lo, float hi) { return v < lo ? lo : (v > hi ? hi : v); }
inline vec3 clamp(const vec3& v, const vec3& lo, const vec3& hi) {
  return vec3(clamp(v.x, lo.x, hi.x), clamp(v.y, lo.y, hi.y), clamp(v.z, lo.z, hi.z));
}
inline double floor(double v) { return std::floor(v); }
inline vec2 floor(const vec2& v) { return vec2(std::floor(v.x), std::floor(v.y)); }
inline vec3 floor(const vec3& v) { return vec3(std::floor(v.x), std::floor(v.y), std::floor(v.z)); }
inline float fract(float v) { return v - std::floor(v); }
inline vec2 fract(const vec2& v) { return vec2(fract(v.x), fract(v.y)); }
inline float mod(float a, float b) { return a - b * std::floor(a / b); }
inline vec2 mod(const vec2& a, const vec2& b) { return vec2(mod(a.x, b.x), mod(a.y, b.y)); }
inline float step(float edge, float x) { return x < edge ? 0.f : 1.f; }
inline vec2 step(const vec2& edge, const vec2& x) { return vec2(step(edge.x, x.x), step(edge.y, x.y)); }
inline vec3 mix(const vec3& a, const vec3& b, float t) { return a * (1.f - t) + b * t; }
inline float sign(float v) { return v > 0.f ? 1.f : (v < 0.f ? -1.f : 0.f); }
inline vec3 pow(const vec3& v, const vec3& e) {
  return vec3(std::pow(v.x, e.x), std::pow(v.y, e.y), std::pow(v.z, e.z));
}

// ---------------- constants (gtc/constants) ----------------
template <typename T> T pi() { return T(3.14159265358979323846); }
template <typename T> T two_pi() { return T(6.28318530717958647692); }
template <typename T> T one_over_pi() { return T(0.31830988618379067154); }
template <typename T> T two_over_pi() { return T(0.63661977236758134308); }
template <typename T> T one_over_two_pi() { return T(0.15915494309189533577); }
template <typename T> T half_pi() { return T(1.57079632679489661923); }

}  // namespace glm
