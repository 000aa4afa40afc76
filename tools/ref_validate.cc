// Reference-implementation validity oracle for the UR5/Fetch validity-count
// investigation (PARITY.md): compiles the reference's own headers
// (/root/reference/src/impl) and runs its exact `validate` semantics
// (bindings/robot_helper.hh:255-267, check_bounds=false) over every start
// and goal of an exported MBM problem file.
//
// Input (text, from tools/export_problems_txt.py):
//   P <name> <index> <n_goals>
//   S x y z r
//   C cx cy cz rho theta phi radius length     (capsule, center+euler)
//   B cx cy cz rho theta phi hx hy hz          (cuboid)
//   q <d floats>                                (start)
//   g <d floats>                                (goal, n_goals times)
// Output: one line per problem: "<name> <index> <start_valid> <goal0_valid> ..."
//
// Build:
//   g++ -O2 -mavx2 -std=c++17 -I/root/reference/src/impl \
//       -I$EIGEN_INCLUDE tools/ref_validate.cc -o ref_validate
// Run: ./ref_validate <robot> < problems.txt

#include <cstdio>
#include <cstring>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include <vamp/collision/factory.hh>
#include <vamp/collision/environment.hh>
#include <vamp/planning/validate.hh>
#include <vamp/robots/ur5.hh>
#include <vamp/robots/panda.hh>
#include <vamp/robots/fetch.hh>
#include <vamp/robots/baxter.hh>

using namespace vamp;

template <typename Robot>
void run()
{
    static constexpr std::size_t rake = vamp::FloatVectorWidth;
    using EnvF = collision::Environment<float>;
    using EnvV = collision::Environment<vamp::FloatVector<rake>>;

    std::string line;
    EnvF env;
    std::string pname;
    int pindex = 0, n_goals = 0;
    std::vector<std::array<float, Robot::dimension>> configs;
    bool have_problem = false;

    auto flush = [&]()
    {
        if (not have_problem)
        {
            return;
        }
        env.sort();
        EnvV env_v(env);
        std::printf("%s %d", pname.c_str(), pindex);
        for (const auto &c : configs)
        {
            typename Robot::Configuration conf(c);
            bool valid =
                planning::validate_motion<Robot, rake, 1>(conf, conf, env_v);
            std::printf(" %d", valid ? 1 : 0);
        }
        std::printf("\n");
        env = EnvF();
        configs.clear();
    };

    while (std::getline(std::cin, line))
    {
        if (line.empty())
        {
            continue;
        }
        std::istringstream ss(line);
        char tag;
        ss >> tag;
        if (tag == 'P')
        {
            flush();
            ss >> pname >> pindex >> n_goals;
            have_problem = true;
        }
        else if (tag == 'S')
        {
            float x, y, z, r;
            ss >> x >> y >> z >> r;
            env.spheres.emplace_back(collision::factory::sphere::flat(x, y, z, r));
        }
        else if (tag == 'C')
        {
            float cx, cy, cz, rho, th, phi, r, l;
            ss >> cx >> cy >> cz >> rho >> th >> phi >> r >> l;
            auto cap = collision::factory::capsule::center::flat(
                cx, cy, cz, rho, th, phi, r, l);
            if (cap.xv == 0. and cap.yv == 0.)
            {
                env.z_aligned_capsules.emplace_back(cap);
            }
            else
            {
                env.capsules.emplace_back(cap);
            }
        }
        else if (tag == 'B')
        {
            float cx, cy, cz, rho, th, phi, hx, hy, hz;
            ss >> cx >> cy >> cz >> rho >> th >> phi >> hx >> hy >> hz;
            auto cub = collision::factory::cuboid::flat(
                cx, cy, cz, rho, th, phi, hx, hy, hz);
            if (cub.axis_3_z == 1.)
            {
                env.z_aligned_cuboids.emplace_back(cub);
            }
            else
            {
                env.cuboids.emplace_back(cub);
            }
        }
        else if (tag == 'q' or tag == 'g')
        {
            std::array<float, Robot::dimension> c{};
            for (std::size_t i = 0; i < Robot::dimension; ++i)
            {
                ss >> c[i];
            }
            configs.emplace_back(c);
        }
    }
    flush();
}

int main(int argc, char **argv)
{
    if (argc < 2)
    {
        std::cerr << "usage: ref_validate <ur5|panda|fetch> < problems.txt\n";
        return 1;
    }
    std::string robot = argv[1];
    if (robot == "ur5")
    {
        run<robots::UR5>();
    }
    else if (robot == "panda")
    {
        run<robots::Panda>();
    }
    else if (robot == "fetch")
    {
        run<robots::Fetch>();
    }
    else if (robot == "baxter")
    {
        run<robots::Baxter>();
    }
    else
    {
        std::cerr << "unknown robot " << robot << "\n";
        return 1;
    }
    return 0;
}
