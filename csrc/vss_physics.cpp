// Native oracle implementation of the VSS physics specification.
//
// The reference delegates dynamics to a C++ engine (rSim, bound at
// Simulators/rsim.py:2).  In this framework the production compute path is
// the XLA-compiled step (rsoccer_tpu/physics/vss.py); this translation unit
// is an INDEPENDENT C++ implementation of the same written spec
// (physics/config.py + physics/common.py + physics/vss.py docstrings), used
// to cross-validate the JAX kernels numerically and as a fast host-side
// single-env fallback.  It deliberately mirrors the spec's order of
// operations in float32 so the two implementations agree to vector-math
// tolerance.
//
// Build: g++ -O2 -shared -fPIC -o libvss_oracle.so vss_physics.cpp

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct FieldParams {
  float half_length;
  float half_width;
  float goal_half_wid;
  float goal_depth;
  float ball_radius;
  float rbt_radius;
  float wheel_radius;
  float max_wheel_rad_s;
};

struct PhysicsParams {
  int n_substeps;
  float robot_accel;
  float robot_alpha;
  float lateral_decay;
  float ball_friction_decel;
  float rest_ball_wall;
  float rest_ball_robot;
  float rest_robot_robot;
  float gravity;
  float rest_ball_ground;
  float ball_bounce_min_v;
  float rbt_height;
};

constexpr float kHalfAxle = 0.04f;  // reference vss_gym_base.py:57-58
constexpr float kEps = 1e-8f;

inline float wrap_angle(float t) {
  // wrap to [-pi, pi) matching jnp.mod semantics (result has divisor sign)
  const float two_pi = 2.0f * static_cast<float>(M_PI);
  float x = t + static_cast<float>(M_PI);
  float m = std::fmod(x, two_pi);
  if (m < 0) m += two_pi;
  return m - static_cast<float>(M_PI);
}

inline float clipf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

// State layout (all float32):
//   ball[6]  = {x, y, z, vx, vy, vz}   (z = center height, rest = radius)
//   robots   = n x {x, y, theta, vx, vy, vtheta}  (row-major, 6 per robot)
//   commands = n x {wheel_left, wheel_right} rad/s
// Steps the world by dt using the same substep sequence as the JAX kernel.
void vss_step(const FieldParams* field, const PhysicsParams* phys, float dt,
              int n_robots, float* ball, float* robots,
              const float* commands, float* out_v_wheel /* n x 2 or null */) {
  const float dts = dt / static_cast<float>(phys->n_substeps);
  const float lat_keep = std::exp(-phys->lateral_decay * dts);
  const float a_lin = phys->robot_accel * dts;
  const float a_ang = phys->robot_alpha * dts;

  // resolve commands -> body-velocity targets
  float v_tgt[32], w_tgt[32];
  for (int i = 0; i < n_robots; ++i) {
    float wl = clipf(commands[2 * i], -field->max_wheel_rad_s,
                     field->max_wheel_rad_s);
    float wr = clipf(commands[2 * i + 1], -field->max_wheel_rad_s,
                     field->max_wheel_rad_s);
    v_tgt[i] = field->wheel_radius * (wl + wr) / 2.0f;
    w_tgt[i] = field->wheel_radius * (wr - wl) / (2.0f * kHalfAxle);
  }

  for (int s = 0; s < phys->n_substeps; ++s) {
    // --- robot drive + integrate
    for (int i = 0; i < n_robots; ++i) {
      float* r = robots + 6 * i;
      float cos_t = std::cos(r[2]);
      float sin_t = std::sin(r[2]);
      float u = r[3] * cos_t + r[4] * sin_t;
      float lat = -r[3] * sin_t + r[4] * cos_t;
      u += clipf(v_tgt[i] - u, -a_lin, a_lin);
      lat *= lat_keep;
      float w = r[5] + clipf(w_tgt[i] - r[5], -a_ang, a_ang);
      float theta = wrap_angle(r[2] + w * dts);
      float cos_n = std::cos(theta);
      float sin_n = std::sin(theta);
      r[2] = theta;
      r[3] = u * cos_n - lat * sin_n;
      r[4] = u * sin_n + lat * cos_n;
      r[5] = w;
      r[0] += r[3] * dts;
      r[1] += r[4] * dts;
    }

    // --- robot-robot collisions (all-pairs, simultaneous like the JAX
    //     kernel: corrections computed from pre-correction state)
    {
      float push_x[32] = {0}, push_y[32] = {0}, imp_x[32] = {0}, imp_y[32] = {0};
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

    // --- robot-wall clamp (dead stop)
    for (int i = 0; i < n_robots; ++i) {
      float* r = robots + 6 * i;
      float xl = field->half_length - field->rbt_radius;
      float yl = field->half_width - field->rbt_radius;
      if (std::fabs(r[0]) > xl && r[3] * (r[0] > 0 ? 1.0f : -1.0f) > 0)
        r[3] = 0.0f;
      if (std::fabs(r[1]) > yl && r[4] * (r[1] > 0 ? 1.0f : -1.0f) > 0)
        r[4] = 0.0f;
      r[0] = clipf(r[0], -xl, xl);
      r[1] = clipf(r[1], -yl, yl);
    }

    // --- ball friction (grounded only) + vertical axis + integrate.
    //     ball = {x, y, z, vx, vy, vz}
    {
      bool on_ground = ball[2] <= field->ball_radius + 1e-4f;
      if (on_ground) {
        float speed = std::sqrt(ball[3] * ball[3] + ball[4] * ball[4]);
        float scale =
            std::fmax(0.0f, 1.0f - phys->ball_friction_decel * dts /
                                std::fmax(speed, kEps));
        ball[3] *= scale;
        ball[4] *= scale;
      }
      ball[5] -= phys->gravity * dts;
      ball[2] += ball[5] * dts;
      if (ball[2] < field->ball_radius) {
        if (ball[5] < 0.0f) ball[5] = -phys->rest_ball_ground * ball[5];
        if (ball[5] < phys->ball_bounce_min_v) ball[5] = 0.0f;
        ball[2] = field->ball_radius;
      }
      ball[0] += ball[3] * dts;
      ball[1] += ball[4] * dts;
    }

    // --- ball-robot collisions (ball takes full correction; contributions
    //     accumulated from the pre-correction ball state, matching the
    //     vectorised JAX kernel).  Skipped while the ball flies above the
    //     robot top plate.
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
        float rvx = ball[3] - robots[6 * i + 3];
        float rvy = ball[4] - robots[6 * i + 4];
        float vn = rvx * nx + rvy * ny;
        if (vn < 0.0f) {
          float jimp = -(1.0f + phys->rest_ball_robot) * vn;
          acc_vx += jimp * nx;
          acc_vy += jimp * ny;
        }
      }
      ball[0] += acc_px;
      ball[1] += acc_py;
      ball[3] += acc_vx;
      ball[4] += acc_vy;
    }

    // --- ball-wall reflection with goal pockets
    {
      float r = field->ball_radius;
      bool in_mouth = std::fabs(ball[1]) < field->goal_half_wid;
      float x_wall =
          (in_mouth ? field->half_length + field->goal_depth
                    : field->half_length) -
          r;
      float sx = ball[0] > 0 ? 1.0f : (ball[0] < 0 ? -1.0f : 0.0f);
      if (std::fabs(ball[0]) > x_wall) {
        ball[0] = sx * x_wall;
        if (ball[3] * sx > 0) ball[3] = -phys->rest_ball_wall * ball[3];
      }
      bool in_pocket = std::fabs(ball[0]) > field->half_length;
      float y_wall =
          (in_pocket ? field->goal_half_wid : field->half_width) - r;
      float sy = ball[1] > 0 ? 1.0f : (ball[1] < 0 ? -1.0f : 0.0f);
      if (std::fabs(ball[1]) > y_wall) {
        ball[1] = sy * y_wall;
        if (ball[4] * sy > 0) ball[4] = -phys->rest_ball_wall * ball[4];
      }
    }
  }

  if (out_v_wheel != nullptr) {
    for (int i = 0; i < n_robots; ++i) {
      const float* r = robots + 6 * i;
      float u = r[3] * std::cos(r[2]) + r[4] * std::sin(r[2]);
      out_v_wheel[2 * i] = (u - r[5] * kHalfAxle) / field->wheel_radius;
      out_v_wheel[2 * i + 1] = (u + r[5] * kHalfAxle) / field->wheel_radius;
    }
  }
}

}  // extern "C"
