// Native oracle implementation of the SSL physics specification.
//
// Companion to vss_physics.cpp: an INDEPENDENT C++ implementation of the
// written spec in rsoccer_tpu/physics/ssl.py (4-omni drive via the wheel
// jacobian, kicker impulse incl. chip kicks, dribbler spring-damper,
// infrared predicate — the dynamics the reference gets from robosim.SSL,
// Simulators/rsim.py:128-155), used to cross-validate the JAX kernel
// numerically.  Mirrors the spec's order of operations in float32.
//
// Build: g++ -O2 -shared -fPIC -o libssl_oracle.so ssl_physics.cpp

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct SSLFieldParams {
  float ball_radius;
  float rbt_radius;
  float wheel_radius;
  float max_wheel_rad_s;
  float wheel_angle_deg[4];  // mount angles from heading
  float rbt_distance_center_kicker;
  float rbt_kicker_thickness;
  float rbt_kicker_width;
};

struct SSLPhysicsParams {
  int n_substeps;
  float robot_accel;
  float robot_alpha;
  float ball_friction_decel;
  float rest_ball_robot;
  float rest_dribbler;  // kicker-face absorption while dribbling
  float rest_robot_robot;
  float gravity;
  float rest_ball_ground;
  float ball_bounce_min_v;
  float rbt_height;
  float kicker_height;
  float kicker_depth_slack;
  float dribbler_pull_accel;
  float dribbler_damping;
  float dribbler_capture_speed;
  float dribbler_reach;
};

constexpr float kEps = 1e-8f;
constexpr int kMaxRobots = 32;

inline float wrap_angle(float t) {
  const float two_pi = 2.0f * static_cast<float>(M_PI);
  float x = t + static_cast<float>(M_PI);
  float m = std::fmod(x, two_pi);
  if (m < 0) m += two_pi;
  return m - static_cast<float>(M_PI);
}

inline float clipf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// wheel jacobian row i: surface speed = -sin(phi)*vx + cos(phi)*vy + R*w
// (physics/ssl.py wheel_jacobian); pinv = (J^T J)^{-1} J^T for full-rank J.
struct Jacobian {
  double J[4][3];
  double pinv[3][4];
};

Jacobian build_jacobian(const SSLFieldParams* f) {
  Jacobian jac;
  for (int i = 0; i < 4; ++i) {
    double phi = f->wheel_angle_deg[i] * M_PI / 180.0;
    jac.J[i][0] = -std::sin(phi);
    jac.J[i][1] = std::cos(phi);
    jac.J[i][2] = f->rbt_radius;
  }
  double g[3][3] = {{0}};  // J^T J
  for (int a = 0; a < 3; ++a)
    for (int b = 0; b < 3; ++b)
      for (int i = 0; i < 4; ++i) g[a][b] += jac.J[i][a] * jac.J[i][b];
  // 3x3 inverse via adjugate
  double det = g[0][0] * (g[1][1] * g[2][2] - g[1][2] * g[2][1]) -
               g[0][1] * (g[1][0] * g[2][2] - g[1][2] * g[2][0]) +
               g[0][2] * (g[1][0] * g[2][1] - g[1][1] * g[2][0]);
  double inv[3][3];
  inv[0][0] = (g[1][1] * g[2][2] - g[1][2] * g[2][1]) / det;
  inv[0][1] = (g[0][2] * g[2][1] - g[0][1] * g[2][2]) / det;
  inv[0][2] = (g[0][1] * g[1][2] - g[0][2] * g[1][1]) / det;
  inv[1][0] = (g[1][2] * g[2][0] - g[1][0] * g[2][2]) / det;
  inv[1][1] = (g[0][0] * g[2][2] - g[0][2] * g[2][0]) / det;
  inv[1][2] = (g[0][2] * g[1][0] - g[0][0] * g[1][2]) / det;
  inv[2][0] = (g[1][0] * g[2][1] - g[1][1] * g[2][0]) / det;
  inv[2][1] = (g[0][1] * g[2][0] - g[0][0] * g[2][1]) / det;
  inv[2][2] = (g[0][0] * g[1][1] - g[0][1] * g[1][0]) / det;
  for (int a = 0; a < 3; ++a)
    for (int i = 0; i < 4; ++i) {
      double s = 0;
      for (int b = 0; b < 3; ++b) s += inv[a][b] * jac.J[i][b];
      jac.pinv[a][i] = s;
    }
  return jac;
}

inline bool face_zone(const SSLFieldParams* f, const SSLPhysicsParams* p,
                      float rx, float ry, float rtheta, float bx, float by,
                      float bz, float hi_extra) {
  float cos_t = std::cos(rtheta);
  float sin_t = std::sin(rtheta);
  float dx = bx - rx;
  float dy = by - ry;
  float lx = dx * cos_t + dy * sin_t;
  float ly = -dx * sin_t + dy * cos_t;
  float lo = f->rbt_distance_center_kicker - f->rbt_kicker_thickness -
             f->ball_radius;
  float hi = f->rbt_distance_center_kicker + f->ball_radius +
             p->kicker_depth_slack + hi_extra;
  bool low = (bz - f->ball_radius) <= p->kicker_height;
  return lx >= lo && lx <= hi && std::fabs(ly) <= f->rbt_kicker_width / 2 &&
         low;
}

inline bool ball_contact(const SSLFieldParams* f, const SSLPhysicsParams* p,
                         float rx, float ry, float rtheta, float bx, float by,
                         float bz) {
  return face_zone(f, p, rx, ry, rtheta, bx, by, bz, 0.0f);
}

// dribbler attraction zone: extends dribbler_reach beyond the kicker
// contact zone (pull only) — physics/ssl.py semantics
inline bool ball_in_reach(const SSLFieldParams* f, const SSLPhysicsParams* p,
                          float rx, float ry, float rtheta, float bx, float by,
                          float bz) {
  return face_zone(f, p, rx, ry, rtheta, bx, by, bz, p->dribbler_reach);
}

}  // namespace

extern "C" {

// State layout (all float32):
//   ball[6]   = {x, y, z, vx, vy, vz}
//   robots    = n x {x, y, theta, vx, vy, vtheta}       (row-major)
//   commands  = n x {wheel_speed_flag, vw0, vw1, vw2, vw3,
//                    v_x, v_y, v_theta, kick_v_x, kick_v_z, dribbler}
//   out_infrared = n floats (0/1), may be null
//   out_v_wheel  = n x 4 achieved wheel rad/s, may be null
void ssl_step(const SSLFieldParams* field, const SSLPhysicsParams* phys,
              float dt, int n_robots, float* ball, float* robots,
              const float* commands, float* out_infrared,
              float* out_v_wheel) {
  const float dts = dt / static_cast<float>(phys->n_substeps);
  const float a_lin = phys->robot_accel * dts;
  const float a_ang = phys->robot_alpha * dts;
  const Jacobian jac = build_jacobian(field);

  // resolve the 8-slot command contract into local-frame velocity targets
  float tgt[kMaxRobots][3];
  for (int i = 0; i < n_robots; ++i) {
    const float* c = commands + 11 * i;
    if (c[0] > 0.5f) {  // wheel-speed mode
      float wheel_ms[4];
      for (int k = 0; k < 4; ++k)
        wheel_ms[k] =
            clipf(c[1 + k], -field->max_wheel_rad_s, field->max_wheel_rad_s) *
            field->wheel_radius;
      for (int a = 0; a < 3; ++a) {
        double s = 0;
        for (int k = 0; k < 4; ++k) s += jac.pinv[a][k] * wheel_ms[k];
        tgt[i][a] = static_cast<float>(s);
      }
    } else {
      tgt[i][0] = c[5];
      tgt[i][1] = c[6];
      tgt[i][2] = c[7];
    }
  }

  bool infrared[kMaxRobots] = {false};

  for (int s = 0; s < phys->n_substeps; ++s) {
    // --- drive: track the local target under accel clamps (lateral is
    //     actuated too — omni drive, unlike the VSS lateral decay)
    for (int i = 0; i < n_robots; ++i) {
      float* r = robots + 6 * i;
      float cos_t = std::cos(r[2]);
      float sin_t = std::sin(r[2]);
      float u = r[3] * cos_t + r[4] * sin_t;
      float sv = -r[3] * sin_t + r[4] * cos_t;
      u += clipf(tgt[i][0] - u, -a_lin, a_lin);
      sv += clipf(tgt[i][1] - sv, -a_lin, a_lin);
      float w = r[5] + clipf(tgt[i][2] - r[5], -a_ang, a_ang);
      float theta = wrap_angle(r[2] + w * dts);
      float cos_n = std::cos(theta);
      float sin_n = std::sin(theta);
      r[2] = theta;
      r[3] = u * cos_n - sv * sin_n;
      r[4] = u * sin_n + sv * cos_n;
      r[5] = w;
      r[0] += r[3] * dts;
      r[1] += r[4] * dts;
    }

    // --- robot-robot collisions (simultaneous, from pre-correction state)
    {
      float push_x[kMaxRobots] = {0}, push_y[kMaxRobots] = {0};
      float imp_x[kMaxRobots] = {0}, imp_y[kMaxRobots] = {0};
      for (int i = 0; i < n_robots; ++i) {
        for (int j = 0; j < n_robots; ++j) {
          if (i == j) continue;
          float dx = robots[6 * i] - robots[6 * j];
          float dy = robots[6 * i + 1] - robots[6 * j + 1];
          float d = std::sqrt(dx * dx + dy * dy);
          float overlap = 2.0f * field->rbt_radius - d;
          if (overlap <= 0.0f) continue;
          float nx = dx / std::fmax(d, kEps);
          float ny = dy / std::fmax(d, kEps);
          push_x[i] += 0.5f * overlap * nx;
          push_y[i] += 0.5f * overlap * ny;
          float rvx = robots[6 * i + 3] - robots[6 * j + 3];
          float rvy = robots[6 * i + 4] - robots[6 * j + 4];
          float vn = rvx * nx + rvy * ny;
          if (vn < 0.0f) {
            float jimp = -(1.0f + phys->rest_robot_robot) * 0.5f * vn;
            imp_x[i] += jimp * nx;
            imp_y[i] += jimp * ny;
          }
        }
      }
      for (int i = 0; i < n_robots; ++i) {
        robots[6 * i] += push_x[i];
        robots[6 * i + 1] += push_y[i];
        robots[6 * i + 3] += imp_x[i];
        robots[6 * i + 4] += imp_y[i];
      }
    }
    // (no walls: SSL episodes end on out-of-bounds before walls matter)

    // --- ball: friction (grounded), dribbler pull, vertical, integrate
    float bvx = ball[3], bvy = ball[4];
    bool on_ground = ball[2] <= field->ball_radius + 1e-4f;
    if (on_ground) {
      float speed = std::sqrt(bvx * bvx + bvy * bvy);
      float scale = std::fmax(
          0.0f, 1.0f - phys->ball_friction_decel * dts / std::fmax(speed, kEps));
      bvx *= scale;
      bvy *= scale;
    }
    {
      float pull_x = 0, pull_y = 0;
      for (int i = 0; i < n_robots; ++i) {
        const float* r = robots + 6 * i;
        const float* c = commands + 11 * i;
        bool held = c[10] > 0.5f &&
                    ball_in_reach(field, phys, r[0], r[1], r[2], ball[0],
                                  ball[1], ball[2]);
        if (!held) continue;
        float cos_n = std::cos(r[2]);
        float sin_n = std::sin(r[2]);
        float face_x = r[0] + field->rbt_distance_center_kicker * cos_n;
        float face_y = r[1] + field->rbt_distance_center_kicker * sin_n;
        // damping vs the FACE POINT velocity (incl. omega x r): a turning
        // robot carries the ball (physics/ssl.py semantics)
        float face_vx = r[3] - r[5] * field->rbt_distance_center_kicker * sin_n;
        float face_vy = r[4] + r[5] * field->rbt_distance_center_kicker * cos_n;
        float rel_vx = bvx - face_vx;
        float rel_vy = bvy - face_vy;
        if (std::sqrt(rel_vx * rel_vx + rel_vy * rel_vy) >=
            phys->dribbler_capture_speed)
          continue;
        pull_x += phys->dribbler_pull_accel * (face_x - ball[0]) -
                  phys->dribbler_damping * rel_vx;
        pull_y += phys->dribbler_pull_accel * (face_y - ball[1]) -
                  phys->dribbler_damping * rel_vy;
      }
      bvx += pull_x * dts;
      bvy += pull_y * dts;
    }
    ball[5] -= phys->gravity * dts;
    ball[2] += ball[5] * dts;
    if (ball[2] < field->ball_radius) {
      if (ball[5] < 0.0f) ball[5] = -phys->rest_ball_ground * ball[5];
      if (ball[5] < phys->ball_bounce_min_v) ball[5] = 0.0f;
      ball[2] = field->ball_radius;
    }
    ball[0] += bvx * dts;
    ball[1] += bvy * dts;

    // --- ball-robot collisions while below the robot top plate
    if (ball[2] - field->ball_radius < phys->rbt_height) {
      float acc_px = 0, acc_py = 0, acc_vx = 0, acc_vy = 0;
      for (int i = 0; i < n_robots; ++i) {
        float dx = ball[0] - robots[6 * i];
        float dy = ball[1] - robots[6 * i + 1];
        float d = std::sqrt(std::fmax(dx * dx + dy * dy, kEps));
        float min_d = field->rbt_radius + field->ball_radius;
        float overlap = min_d - d;
        if (overlap <= 0.0f) continue;
        float nx = dx / std::fmax(d, kEps);
        float ny = dy / std::fmax(d, kEps);
        acc_px += overlap * nx;
        acc_py += overlap * ny;
        float rvx = bvx - robots[6 * i + 3];
        float rvy = bvy - robots[6 * i + 4];
        float vn = rvx * nx + rvy * ny;
        if (vn < 0.0f) {
          // dribbler-face absorption (physics/ssl.py): damped restitution
          // when the ball strikes the kicker sector of a dribbling robot
          const float* c = commands + 11 * i;
          bool face_in =
              ball_contact(field, phys, robots[6 * i], robots[6 * i + 1],
                           robots[6 * i + 2], ball[0], ball[1], ball[2]);
          float rest = (face_in && c[10] > 0.5f) ? phys->rest_dribbler
                                                 : phys->rest_ball_robot;
          float jimp = -(1.0f + rest) * vn;
          acc_vx += jimp * nx;
          acc_vy += jimp * ny;
        }
      }
      ball[0] += acc_px;
      ball[1] += acc_py;
      bvx += acc_vx;
      bvy += acc_vy;
    }

    // --- kick: replace the heading-aligned velocity; kick_v_z chips
    {
      float kvx = 0, kvy = 0, kvz = 0;
      bool any_kick = false;
      for (int i = 0; i < n_robots; ++i) {
        const float* r = robots + 6 * i;
        const float* c = commands + 11 * i;
        bool contact_after = ball_contact(field, phys, r[0], r[1], r[2],
                                          ball[0], ball[1], ball[2]);
        infrared[i] = contact_after;
        if (contact_after && c[8] > 0.0f) {
          any_kick = true;
          kvx += c[8] * std::cos(r[2]);
          kvy += c[8] * std::sin(r[2]);
          kvz += c[9];
        }
      }
      if (any_kick) {
        bvx = kvx;
        bvy = kvy;
        if (kvz > 0.0f) ball[5] = kvz;
      }
    }
    ball[3] = bvx;
    ball[4] = bvy;
  }

  if (out_infrared != nullptr)
    for (int i = 0; i < n_robots; ++i)
      out_infrared[i] = infrared[i] ? 1.0f : 0.0f;
  if (out_v_wheel != nullptr) {
    for (int i = 0; i < n_robots; ++i) {
      const float* r = robots + 6 * i;
      float cos_t = std::cos(r[2]);
      float sin_t = std::sin(r[2]);
      float local[3] = {r[3] * cos_t + r[4] * sin_t,
                        -r[3] * sin_t + r[4] * cos_t, r[5]};
      for (int k = 0; k < 4; ++k) {
        double s = 0;
        for (int a = 0; a < 3; ++a) s += jac.J[k][a] * local[a];
        out_v_wheel[4 * i + k] = static_cast<float>(s / field->wheel_radius);
      }
    }
  }
}

}  // extern "C"
